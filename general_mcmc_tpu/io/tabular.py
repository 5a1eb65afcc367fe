"""Sample export: CSV / Arrow IPC / Parquet.

Rebuild of the reference's io/ layer (io/csv.rs, io/arrow.rs, io/parquet.rs):
one shared tabular schema for a ``[chains, observations, dims]`` sample —
columns ``chain:u32, observation:u32, dim_0..dim_{D-1}:f64``
(io/csv.rs:54-56, io/arrow.rs:61-73, io/parquet.rs:53-66).  All three
formats are written through pyarrow's native C++ writers (the analog of the
reference's csv/arrow/parquet crates); Arrow/Parquet are feature-gated at
import time the way the reference gates them behind Cargo features
(io/mod.rs:5-12).

The reference's ``save_parquet_tensor`` takes a transposed
``[obs, chain, dim]`` layout unlike every other entry point
(io/parquet.rs:124, 193-200); we use the uniform ``[chain, obs, dim]``
layout everywhere.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_csv", "save_arrow", "save_parquet", "to_table", "load_table"]


def _as_3d(data) -> np.ndarray:
    arr = np.asarray(data)
    if arr.ndim != 3:
        raise ValueError(f"expected [chains, observations, dims], got {arr.shape}")
    return arr


def to_table(data):
    """Build a pyarrow Table in the shared export schema."""
    import pyarrow as pa

    arr = _as_3d(data)
    c, s, d = arr.shape
    cols = {
        "chain": pa.array(np.repeat(np.arange(c, dtype=np.uint32), s)),
        "observation": pa.array(np.tile(np.arange(s, dtype=np.uint32), c)),
    }
    flat = arr.reshape(c * s, d).astype(np.float64)
    for i in range(d):
        cols[f"dim_{i}"] = pa.array(flat[:, i])
    return pa.table(cols)


def save_csv(data, filename: str) -> None:
    """Write the sample as CSV (save_csv, io/csv.rs:47-69).

    Routes through the native C++ serializer (csrc/fastio.cpp) when it can
    be built, falling back to pyarrow's writer."""
    from .native import native_write_csv, native_write_csv_available

    if native_write_csv_available():
        native_write_csv(_as_3d(data), filename)
        return
    import pyarrow.csv as pacsv

    pacsv.write_csv(to_table(data), filename)


def save_arrow(data, filename: str) -> None:
    """Write the sample as an Arrow IPC file (save_arrow, io/arrow.rs:53-117)."""
    import pyarrow as pa

    table = to_table(data)
    with pa.OSFile(filename, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)


def save_parquet(data, filename: str) -> None:
    """Write the sample as Parquet (save_parquet, io/parquet.rs:49-109)."""
    import pyarrow.parquet as pq

    pq.write_table(to_table(data), filename)


def load_table(filename: str) -> np.ndarray:
    """Read any of the three formats back into [chains, obs, dims]."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    if filename.endswith(".csv"):
        table = pacsv.read_csv(filename)
    elif filename.endswith(".parquet"):
        table = pq.read_table(filename)
    else:
        with pa.OSFile(filename, "rb") as f:
            table = pa.ipc.open_file(f).read_all()
    df = table.to_pandas()
    n_chains = int(df["chain"].max()) + 1
    n_obs = int(df["observation"].max()) + 1
    dims = [c for c in df.columns if c.startswith("dim_")]
    out = df.sort_values(["chain", "observation"])[dims].to_numpy()
    return out.reshape(n_chains, n_obs, len(dims))
