"""connected_components: driver union-find tier vs distributed
min-label propagation tier return identical rows."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from warcit_ray.stages.components import connected_components


def _graph_pairs():
    # chain 0-1-2-3-4 (diameter > 1 forces several propagation rounds),
    # a 4-clique {10,11,12,13}, one isolated pair (20, 21), and a star
    # 30 <- {31, 32, 33}; edges given in unhelpful orders
    edges = [(1, 0), (1, 2), (3, 2), (3, 4),
             (10, 11), (12, 10), (13, 11), (12, 13),
             (21, 20),
             (31, 30), (30, 32), (33, 30)]
    return [{"id_a": a, "id_b": b} for a, b in edges]


EXPECTED = {
    0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
    10: 10, 11: 10, 12: 10, 13: 10,
    20: 20, 21: 20,
    30: 30, 31: 30, 32: 30, 33: 30,
}


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["member"] = df["member"].astype("int64")
    df["component"] = df["component"].astype("int64")
    return df.sort_values("member").reset_index(drop=True)


def test_components_small_tier(ray_session):
    got = _canon(connected_components(rd.from_items(_graph_pairs())))
    assert dict(zip(got["member"], got["component"])) == EXPECTED


def test_components_distributed_tier_equivalent(ray_session):
    pairs = rd.from_items(_graph_pairs())
    small = _canon(connected_components(pairs, small_threshold=10**9))
    dist = _canon(connected_components(pairs, small_threshold=0,
                                       num_buckets=4))
    pd.testing.assert_frame_equal(small, dist)
    assert dict(zip(dist["member"], dist["component"])) == EXPECTED


def test_components_empty(ray_session):
    out = connected_components(rd.from_items([]))
    # stable schema even for zero pairs (empty Dataset.to_pandas drops
    # columns — a Ray quirk — so assert on the Dataset schema)
    assert out.schema().names == ["member", "component"]
    assert out.count() == 0


def test_components_distributed_tier_63bit_ids_exact(ray_session):
    # ADVICE r4: ids >= 2^53 must survive the distributed tier exactly
    # (they are 63-bit hashes in the >5M-pair regime the tier exists
    # for); any float64 transit would round them to wrong components
    base = (1 << 62) + 1
    pairs = rd.from_items([
        {"id_a": base + 0, "id_b": base + 1},
        {"id_a": base + 1, "id_b": base + 2},   # chain -> one component
        {"id_a": base + 10, "id_b": base + 11},  # separate pair
    ])
    got = _canon(connected_components(pairs, small_threshold=0,
                                      num_buckets=4))
    assert dict(zip(got["member"], got["component"])) == {
        base + 0: base + 0, base + 1: base + 0, base + 2: base + 0,
        base + 10: base + 10, base + 11: base + 10,
    }


def test_components_raises_when_iteration_budget_exhausted(ray_session):
    # a path graph's min label walks one hop per round: a 10-node chain
    # cannot converge in 2 rounds — the distributed tier must refuse to
    # return unconverged labels (VERDICT r4 #3)
    chain = rd.from_items(
        [{"id_a": i, "id_b": i + 1} for i in range(9)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, small_threshold=0, num_buckets=2,
                             max_iters=2)
    # and with budget to spare the same graph converges exactly
    ok = _canon(connected_components(chain, small_threshold=0,
                                     num_buckets=2, max_iters=16))
    assert set(ok["component"]) == {0}


def test_components_random_graph_matches_unionfind(ray_session):
    # random sparse graph: distributed tier vs union-find ground truth.
    # kept small: each propagation round costs two Ray jobs, and rounds
    # scale with component eccentricity — a dense-ish 48-node graph has
    # small diameter but still multi-node merged components
    rng = np.random.default_rng(5)
    n = 48
    a = rng.integers(0, n, 60)
    b = rng.integers(0, n, 60)
    keep = a != b
    pairs = rd.from_items(
        [{"id_a": int(x), "id_b": int(y)} for x, y in zip(a[keep], b[keep])])
    small = _canon(connected_components(pairs, small_threshold=10**9))
    dist = _canon(connected_components(pairs, small_threshold=0,
                                       num_buckets=8))
    pd.testing.assert_frame_equal(small, dist)
