"""Preprocessing pipeline round-trip: synthetic .dat -> split files -> loader."""

import os

import numpy as np

from tagrec_tpu.data import preprocess as pp
from tagrec_tpu.data.graph import HeteroGraph


def make_dat(tmp_path, n=600, seed=0):
    rng = np.random.default_rng(seed)
    d = tmp_path / "hetrec2011-lastfm-2k"
    d.mkdir(parents=True)
    rows = []
    # raw sparse id spaces with gaps; tag 7 frequent, tag 999 rare
    for _ in range(n):
        u = int(rng.choice([3, 10, 17, 25, 42, 77, 100]))
        i = int(rng.choice(np.arange(5, 60, 3)))
        t = int(rng.choice([7, 8, 9, 11], p=[0.5, 0.3, 0.15, 0.05]))
        rows.append((u, i, t))
    rows.append((3, 5, 999))  # rare tag, must be dropped (min_count=5)
    with open(d / "user_taggedartists.dat", "w") as f:
        f.write("userID\tartistID\ttagID\tday\tmonth\tyear\n")
        for u, i, t in rows:
            f.write(f"{u}\t{i}\t{t}\t1\t1\t2011\n")
    return str(tmp_path)


def test_preprocess_roundtrip(tmp_path):
    root = make_dat(tmp_path)
    stats = pp.preprocess_hetrec(root, "hetrec2011-lastfm-2k",
                                 out_dir=str(tmp_path / "out"))
    assert stats["user"] == 7
    # dense id spaces + splits load cleanly
    g = HeteroGraph.load(str(tmp_path), "out", use_tag=True)
    assert g.n_user <= 7 and g.n_item >= 1 and g.n_tag >= 1
    # train/test per user are disjoint
    for u, te in g.user_items["test"].items():
        tr = set(g.user_items["train"].get(u, []))
        assert not tr.intersection(te)
    # every uit triple's (u, i) is a train pair
    train_pairs = {(u, i) for u, its in g.user_items["train"].items()
                   for i in its}
    for u, i, t in g.uit_data:
        assert (int(u), int(i)) in train_pairs
    # rare tag got dropped: all tag ids dense in [0, n_tag)
    assert g.uit_data[:, 2].max() == g.n_tag - 1
    # single-item users went to test only
    for u, its in g.user_items["test"].items():
        if u not in g.user_items["train"]:
            assert len(its) >= 1


def test_kg_loader(tmp_path, tiny_graph):
    """KnowledgeGraph triplet assembly (reference data/kgat_load.py:22-38)."""
    import numpy as np
    from tagrec_tpu.data.kg import KnowledgeGraph

    d = tmp_path / "kgds"
    d.mkdir()
    kg = np.array([[0, 0, 1], [1, 1, 2], [2, 0, 3]])
    np.savetxt(d / "kg_final.txt", kg, fmt="%d")
    g = tiny_graph
    k = KnowledgeGraph(g, str(tmp_path), "kgds")
    assert k.num_entity == 4 and k.num_rela == 2 and k.num_relation == 6
    e = len(g.edge_index["train"])
    assert len(k.all_triplet) == 2 * e + 2 * len(kg)
    # ui triples use relation 0; reversed +num_rela+1
    assert np.all(k.all_triplet[:e, 1] == 0)
    assert np.all(k.all_triplet[e:2 * e, 1] == k.num_rela + 1)
    # kg heads/tails offset by n_user, relations +1
    kg_part = k.all_triplet[2 * e:2 * e + len(kg)]
    assert np.all(kg_part[:, 0] == kg[:, 0] + g.n_user)
    assert np.all(kg_part[:, 1] == kg[:, 1] + 1)
    rd = k.relation_dict()
    assert len(rd) == 6 and len(rd[0]) == e


def test_graph_summary(tiny_graph):
    s = tiny_graph.summary()
    assert s["num"]["user"] == tiny_graph.n_user
    assert s["train"]["pairs"] == len(tiny_graph.edge_index["train"])
    assert s["uit"]["tags"] == tiny_graph.n_tag
