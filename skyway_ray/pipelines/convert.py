"""Convert-and-filter pipeline — the reference's main trace
(``/root/reference/src/main.rs:77-196``) re-hosted on Ray Data:

    reader → [filter₁ → filter₂ → …] → writer

Readers/writers dispatch by flag or extension (io/registry.py); each
``--filter`` file compiles once (OSMFilter first, CEL fallback —
``src/filter/mod.rs:18-28``) and runs as its own ``map_batches`` stage,
the daisy-chained-threads analogue (``main.rs:150-171``).  Metadata
flows driver-side (the reference's one-shot metadata channel).

CLI::

    python -m skyway_ray.pipelines.convert INPUT OUTPUT \
        [--from FMT] [--to FMT] [--filter FILE]...
"""

from __future__ import annotations

import argparse
import sys

from ..filters.cel import create_filter
from ..io.registry import read_elements, write_elements


def convert(input_path: str, output_path: str, input_format: str | None = None,
            output_format: str | None = None, filters: list[str] | None = None,
            overpass: bool = False) -> int:
    """Run the convert pipeline; returns rows written (or -1 for sinks
    that don't count)."""
    result = read_elements(input_path, input_format)
    ds, metadata = result if isinstance(result, tuple) else (result, {})
    for source in filters or []:
        f = create_filter(source)
        ds = ds.map_batches(f.apply_table, batch_format="pyarrow")
    return write_elements(ds, output_path, output_format, metadata,
                          overpass=overpass)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--from", dest="input_format", default=None)
    p.add_argument("--to", dest="output_format", default=None)
    p.add_argument("--filter", dest="filters", action="append", default=[],
                   help="filter file (OSMFilter or CEL); repeatable, chained "
                        "in order")
    p.add_argument("--overpass", action="store_true",
                   help="overpass-style JSON output header")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    try:
        sources = []
        for path in args.filters:
            with open(path, encoding="utf-8") as f:
                sources.append(f.read())
        n = convert(args.input, args.output, args.input_format,
                    args.output_format, sources, overpass=args.overpass)
    except (ValueError, FileNotFoundError, NotImplementedError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        ray.shutdown()
    print(f"wrote {n} elements to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
