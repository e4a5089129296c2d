"""Connected components over a pair Dataset.

The dedup family reduces a corpus to verified duplicate PAIRS
(id_a, id_b); turning pairs into duplicate GROUPS is a connected-
components pass. ``components_from_pairs`` (stages/dedup.py) does it
with a driver-side union-find, which is right when the pair list is the
job's small output — but a 10^10-doc corpus with a high dup rate can
make the pair set itself corpus-scale. This module gives components the
same size-gated treatment as every other driver-touching step in the
engine:

- at or below ``small_threshold`` pairs: driver union-find (exact
  union-find is inherently sequential and the rows fit);
- above: distributed min-label propagation — labels (id, lbl) start at
  ``min(id, direct neighbors)`` and each round joins current labels
  into the symmetric edge list and takes the per-id min of (own label,
  propagated labels). Each round is one bucketed hash join + one
  groupby-min; rounds needed = graph eccentricity from each component's
  minimum (near-dup clusters are shallow). Convergence is detected by
  the monotone non-increasing label sum.

Both tiers return the same rows (forced-tier equivalence test in
tests/test_components.py): one (member, component) row per distinct id
appearing in ``pairs``, component = smallest reachable id (the
representative maps to itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EMPTY = pa.schema([pa.field("member", pa.int64()),
                    pa.field("component", pa.int64())])


def connected_components(pairs, *, id_a: str = "id_a", id_b: str = "id_b",
                         small_threshold: int = 5_000_000,
                         num_buckets: int = 16, max_iters: int = 64):
    """Dataset[(id_a, id_b, ...)] -> Dataset[(member, component)].

    ``max_iters`` bounds PROPAGATION ROUNDS INCLUDING the final
    no-change round that certifies the fixpoint: a component whose
    min-label eccentricity is e needs e+1 rounds to be certified, so
    size max_iters STRICTLY ABOVE the largest expected eccentricity.
    The distributed tier raises rather than return labels it cannot
    certify (a change in the last allowed round leaves convergence
    unknown)."""
    import ray.data as rd

    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(_EMPTY.empty_table())

    if n_pairs <= small_threshold:
        from .dedup import components_from_pairs

        df = pairs.to_pandas()
        rows = components_from_pairs(
            list(zip(df[id_a].astype("int64"), df[id_b].astype("int64"))))
        return rd.from_arrow(pa.table({
            "member": pa.array([int(m) for m, _ in rows], type=pa.int64()),
            "component": pa.array([int(c) for _, c in rows], type=pa.int64()),
        }))

    return _propagate_min_labels(pairs, id_a, id_b, num_buckets, max_iters)


def _propagate_min_labels(pairs, id_a: str, id_b: str,
                          num_buckets: int, max_iters: int):
    """Distributed tier: iterative min-label propagation."""
    from .joins import bucketed_hash_join

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    # consumed every round: pin the symmetric edges in the object store
    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def min_of_group(col_out: str):
        def f(t: pa.Table) -> pa.Table:
            name = [n for n in t.schema.names if n.startswith("min(")][0]
            return pa.table({"id": t.column("id"),
                             col_out: t.column(name)})
        return f

    # round 0: lbl(id) = min(id, min neighbor)
    def seed(t: pa.Table) -> pa.Table:
        src = t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
        dst = t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"id": pa.array(src),
                         "lbl": pa.array(np.minimum(src, dst))})

    # repartition cap: without it the per-round union+groupby multiplies
    # block counts and iteration wall time grows ~3x per round (measured
    # 7.8 -> 22.6 -> 67.5 s); capped, rounds are flat
    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("id").min("lbl")
        .map_batches(min_of_group("lbl"), batch_format="pyarrow")
        .repartition(num_buckets)
        .materialize()
    )
    prev_sum = labels.sum("lbl")

    converged = False
    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda t: pa.table({"src": t.column("id"), "plbl": t.column("lbl")}),
            batch_format="pyarrow")
        # cast: the join keeps ints integral (nullable-Int64 transit in
        # bucketed_hash_join, so 63-bit ids survive exactly); the cast
        # only pins the schema so labels.union(prop) matches
        _LBL = pa.schema([pa.field("id", pa.int64()),
                          pa.field("lbl", pa.int64())])

        def project(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "dst" not in t.schema.names:
                return _LBL.empty_table()  # empty join bucket block
            return pa.table({"id": t.column("dst").cast(pa.int64()),
                             "lbl": t.column("plbl").cast(pa.int64())})

        prop = bucketed_hash_join(edges, lab_src, "src",
                                  num_buckets=num_buckets).map_batches(
            project, batch_format="pyarrow")
        labels = (
            labels.union(prop)
            .groupby("id").min("lbl")
            .map_batches(min_of_group("lbl"), batch_format="pyarrow")
            .repartition(num_buckets)
            .materialize()
        )
        new_sum = labels.sum("lbl")
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        # callers treat the output as exact; a component whose min-label
        # eccentricity exceeds max_iters would otherwise silently come
        # back with wrong (unconverged) labels
        raise RuntimeError(
            "connected_components did not converge within max_iters=%d "
            "rounds (a component's min-label eccentricity exceeds the "
            "iteration budget); rerun with a larger max_iters" % max_iters)

    return labels.map_batches(
        lambda t: pa.table({"member": t.column("id").cast(pa.int64()),
                            "component": t.column("lbl").cast(pa.int64())}),
        batch_format="pyarrow")
