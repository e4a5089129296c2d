"""Large-large join implementations (bucketed explicit + native)."""

import pandas as pd
import pytest

from warcit_ray.stages.joins import bucketed_hash_join, hash_join


@pytest.fixture(scope="module")
def sides():
    import ray.data as rd

    left = rd.from_items([{"k": i, "lval": i * 10} for i in range(200)])
    right = rd.from_items(
        [{"k": i % 150, "rval": i} for i in range(300)]  # dup keys on the right
    )
    return left, right


def _expected(sides):
    import ray.data as rd  # noqa: F401

    l = pd.DataFrame({"k": range(200), "lval": [i * 10 for i in range(200)]})
    r = pd.DataFrame({"k": [i % 150 for i in range(300)], "rval": range(300)})
    return l.merge(r, on="k").sort_values(["k", "rval"]).reset_index(drop=True)


def test_bucketed_hash_join(sides):
    left, right = sides
    got = (
        bucketed_hash_join(left, right, "k", num_buckets=8)
        .to_pandas()
        .sort_values(["k", "rval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lval", "rval"]],
                                  _expected(sides)[["k", "lval", "rval"]],
                                  check_dtype=False)


def test_native_hash_join_if_available(sides):
    import ray.data as rd

    if not hasattr(rd.Dataset, "join"):
        pytest.skip("Dataset.join not in this Ray version")
    left, right = sides
    got = (
        hash_join(left, right, "k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "rval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lval", "rval"]],
                                  _expected(sides)[["k", "lval", "rval"]],
                                  check_dtype=False)
