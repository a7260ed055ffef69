"""Golden tests for the dense graph builders against hand-computed
adjacency/mailbox arrays (inputs modelled on the reference's only
self-check, collate.py:258-266)."""

import numpy as np

from sessionrec_tpu.graph.builders import (
    build_ccs_batch,
    build_lessr_batch,
    build_session_batch,
)

N = 8  # node cap for tests


def test_session_graph_basic():
    # seq [1,2,3,2]: nodes [1,2,3], nids {1:0,2:1,3:2}
    d = build_session_batch([[1, 2, 3, 2]], [7], N, 1)
    assert d["node_iid"][0, :3].tolist() == [1, 2, 3]
    assert d["node_mask"][0].sum() == 3
    adj = d["adj"][0]
    expect = np.zeros((N, N))
    expect[0, 1] = 1  # 1->2
    expect[1, 2] = 1  # 2->3
    expect[2, 1] = 1  # 3->2
    np.testing.assert_array_equal(adj, expect)
    assert d["last_idx"][0] == 1
    assert d["labels"][0] == 7
    assert d["valid"][0] == 1


def test_session_graph_weights_and_fallback():
    # repeated transition gets count weight 2
    d = build_session_batch([[1, 2, 1, 2]], [0], N, 2)
    assert d["adj"][0][0, 1] == 2  # 1->2 twice
    assert d["adj"][0][1, 0] == 1
    # single-item session: degenerate self-loop 0->0 w=1 (collate.py:74-76)
    d = build_session_batch([[5]], [0], N, 1)
    assert d["adj"][0][0, 0] == 1
    assert d["node_mask"][0].sum() == 1
    # padded example rows are all-zero
    d = build_session_batch([[1, 2]], [0], N, 3)
    assert d["valid"].tolist() == [1, 0, 0]
    assert d["adj"][2].sum() == 0


def test_eop_mailboxes_temporal_order():
    # seq [1,2,3,2]: node 1 (item 2) receives msgs from node0 then node2
    d = build_lessr_batch([[1, 2, 3, 2]], [0], N, 1)
    assert d["mail_idx"][0, 1, :2].tolist() == [0, 2]
    assert d["mail_mask"][0, 1].sum() == 2
    assert d["mail_mask"][0, 0].sum() == 0  # item 1 has no in-edges
    assert d["mail_idx"][0, 2, 0] == 1
    assert d["mail_mask"][0, 2].sum() == 1
    # duplicate edges preserved: [1,2,1,2] -> node1 gets [0, 0]
    d = build_lessr_batch([[1, 2, 1, 2]], [0], N, 1)
    assert d["mail_idx"][0, 1, :2].tolist() == [0, 0]
    assert d["mail_mask"][0, 1].sum() == 2


def test_shortcut_graph():
    d = build_lessr_batch([[1, 2, 3, 2]], [0], N, 1)
    sc = d["sc_adj"][0]
    # expected deduped at-or-before pairs incl. self-loops
    expect = np.zeros((N, N))
    for (u, v) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2), (2, 1)]:
        expect[u, v] = 1
    np.testing.assert_array_equal(sc, expect)


def test_ccs_order2():
    d = build_ccs_batch([[1, 2, 3, 2]], [0], order=2, max_len=N, batch_size=1)
    lv1, lv2 = d["levels"]
    assert lv1["iid"][0, :3, 0].tolist() == [1, 2, 3]
    assert lv1["last_idx"][0] == 1
    # level-2 grams in first-occurrence order: (1,2),(2,3),(3,2)
    assert lv2["iid"][0, :3].tolist() == [[1, 2], [2, 3], [3, 2]]
    assert lv2["mask"][0].sum() == 3
    assert lv2["last_idx"][0] == 2
    intra2 = lv2["intra_adj"][0]
    assert intra2[0, 1] == 1 and intra2[1, 2] == 1 and intra2.sum() == 2
    # inter: s1->s2 = (item i, gram i+1); s2->s1 = (gram i, item i+2)
    ii = d["inter_in"][0][0]
    io = d["inter_out"][0][0]
    assert ii[0, 1] == 1 and ii[1, 2] == 1 and ii.sum() == 2
    assert io[0, 2] == 1 and io[1, 1] == 1 and io.sum() == 2


def test_ccs_gram_dedup():
    # [1,2,1,2]: level-2 grams (1,2),(2,1) — (1,2) occurs twice, deduped
    d = build_ccs_batch([[1, 2, 1, 2]], [0], order=2, max_len=N, batch_size=1)
    lv2 = d["levels"][1]
    assert lv2["mask"][0].sum() == 2
    assert lv2["iid"][0, :2].tolist() == [[1, 2], [2, 1]]
    # transitions: g0->g1, g1->g0 (dedup keeps both directions once)
    intra2 = lv2["intra_adj"][0]
    assert intra2[0, 1] == 1 and intra2[1, 0] == 1 and intra2.sum() == 2
    # last gram of session = (1,2) = gram 0
    assert lv2["last_idx"][0] == 0


def test_ccs_pad_level():
    # session shorter than order: pad node = smallest item repeated,
    # last_idx 0, no edges (collate.py:191-211)
    d = build_ccs_batch([[3, 1]], [0], order=3, max_len=N, batch_size=1)
    lv3 = d["levels"][2]
    assert lv3["mask"][0].sum() == 1
    assert lv3["iid"][0, 0].tolist() == [1, 1, 1]
    assert lv3["last_idx"][0] == 0
    assert lv3["intra_adj"][0].sum() == 0
    assert d["inter_in"][1][0].sum() == 0
    assert d["inter_out"][1][0].sum() == 0
    # level 2 exists: grams [(3,1)]
    lv2 = d["levels"][1]
    assert lv2["mask"][0].sum() == 1
    assert lv2["iid"][0, 0].tolist() == [3, 1]
