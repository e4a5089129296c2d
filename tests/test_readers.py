"""Reader shim (sources/readers.py): format sniffing, pruned parquet
reads with explicit block splitting, and the lance strict-stub."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from warcit_ray.sources.readers import read_table, table_path


def test_table_path_sniffing(tmp_path):
    pq.write_table(pa.table({"a": [1]}), tmp_path / "t.parquet")
    assert table_path(str(tmp_path), "t") == ("parquet", str(tmp_path / "t.parquet"))
    # a .lance dataset DIRECTORY takes precedence over same-named parquet
    (tmp_path / "t.lance").mkdir()
    assert table_path(str(tmp_path), "t")[0] == "lance"


def test_parquet_read_pruned_and_split(tmp_path, ray_session):
    tbl = pa.table({"a": list(range(100)), "b": ["x"] * 100})
    pq.write_table(tbl, tmp_path / "t.parquet")
    ds = read_table(str(tmp_path), "t", columns=["a"], blocks=4)
    assert ds.schema().names == ["a"]
    assert ds.count() == 100
    assert ds.materialize().num_blocks() >= 2  # override_num_blocks applied


def test_lance_strict_stub(tmp_path, ray_session):
    pq.write_table(pa.table({"a": [1]}), tmp_path / "t.parquet")
    (tmp_path / "t.lance").mkdir()
    with pytest.raises(RuntimeError, match="lance"):
        read_table(str(tmp_path), "t")
