"""Export-layer tests: the shared chain/observation/dim_* schema
(io/csv.rs:54-56, io/arrow.rs:61-73, io/parquet.rs:53-66) and roundtrips."""

import numpy as np
import pytest

from general_mcmc_tpu.io import load_table, save_arrow, save_csv, save_parquet, to_table


@pytest.fixture
def sample():
    rng = np.random.default_rng(0)
    return rng.normal(size=(3, 5, 2)).astype(np.float64)


def test_schema(sample):
    table = to_table(sample)
    assert table.column_names == ["chain", "observation", "dim_0", "dim_1"]
    assert str(table.schema.field("chain").type) == "uint32"
    assert str(table.schema.field("observation").type) == "uint32"
    assert str(table.schema.field("dim_0").type) == "double"
    assert table.num_rows == 15


def test_row_order(sample):
    df = to_table(sample).to_pandas()
    row = df.iloc[7]  # chain 1, observation 2
    assert row["chain"] == 1 and row["observation"] == 2
    np.testing.assert_allclose(
        [row["dim_0"], row["dim_1"]], sample[1, 2], atol=1e-12
    )


@pytest.mark.parametrize(
    "saver,suffix",
    [(save_csv, "csv"), (save_arrow, "arrow"), (save_parquet, "parquet")],
)
def test_roundtrip(tmp_path, sample, saver, suffix):
    path = str(tmp_path / f"out.{suffix}")
    saver(sample, path)
    back = load_table(path)
    np.testing.assert_allclose(back, sample, atol=1e-9)


def test_rejects_bad_shape():
    with pytest.raises(ValueError):
        to_table(np.zeros((3, 4)))


def test_native_csv_matches_pyarrow(tmp_path, sample):
    """The C++ serializer and the pyarrow path must produce equal values."""
    from general_mcmc_tpu.io.native import (
        native_write_csv,
        native_write_csv_available,
    )

    if not native_write_csv_available():
        pytest.skip("no C++ toolchain")
    p_native = str(tmp_path / "native.csv")
    native_write_csv(sample, p_native)
    back = load_table(p_native)
    np.testing.assert_allclose(back, sample, atol=0)  # shortest round-trip
    with open(p_native) as f:
        header = f.readline().strip()
    assert header == "chain,observation,dim_0,dim_1"
