"""Lance source/sink — gated on the ``lance`` package.

The north rule's input is a Lance table of image+caption pairs; this
container has no ``lance``/``pylance`` wheel, so parquet is the
engine's native storage stand-in (identical Arrow schema — see
``fixtures.py``) and these wrappers activate on a cluster where Lance
is installed: ``ray.data.read_lance`` (Ray ships the datasource) for
reads, ``lance.write_dataset`` over ``iter_batches`` for writes.
"""

from __future__ import annotations


def _require_lance():
    try:
        import lance  # noqa: F401

        return lance
    except ImportError as e:
        raise ImportError(
            "the 'lance' package is not installed in this environment; "
            "use parquet (identical Arrow schema) or install pylance on "
            "the cluster"
        ) from e


def read_lance(uri: str, columns=None):
    """Lance → Dataset (one fragment per read task)."""
    _require_lance()
    import ray.data

    return ray.data.read_lance(uri, columns=columns)


def write_lance(ds, uri: str, mode: str = "create") -> int:
    """Dataset → Lance, streaming via iter_batches (no driver
    materialization of the whole table)."""
    lance = _require_lance()
    import pyarrow as pa

    first = None
    rows = 0

    def batches():
        nonlocal rows
        for b in ds.iter_batches(batch_format="pyarrow"):
            rows += b.num_rows
            yield b if isinstance(b, pa.RecordBatch) else \
                pa.RecordBatch.from_pandas(b.to_pandas()) if not isinstance(b, pa.Table) \
                else b.combine_chunks().to_batches()[0]

    it = batches()
    try:
        first = next(it)
    except StopIteration:
        return 0

    def chain():
        yield first
        yield from it

    reader = pa.RecordBatchReader.from_batches(first.schema, chain())
    lance.write_dataset(reader, uri, mode=mode)
    return rows
