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
            overpass: bool = False, single_part: bool = False) -> int:
    """Run the convert pipeline; returns rows written (or -1 for sinks
    that don't count).  ``single_part`` coalesces to one block before
    the sink (order-preserving) — used for stdout piping, where part
    files would interleave element order."""
    result = read_elements(input_path, input_format)
    ds, metadata = result if isinstance(result, tuple) else (result, {})
    for source in filters or []:
        f = create_filter(source)
        ds = ds.map_batches(f.apply_table, batch_format="pyarrow")
    if single_part:
        # deterministic single block in INPUT order: repartition(1)'s
        # output bundling follows task completion order and observably
        # reorders ~1 run in 6; to_arrow_refs() returns refs in block
        # order, so a driver-side concat is order-stable (pipe outputs
        # are small by usage)
        import pyarrow as pa
        import ray
        import ray.data

        tabs = [t for t in (ray.get(r) for r in ds.to_arrow_refs())
                if t.num_rows]
        if tabs:
            ds = ray.data.from_arrow(
                pa.concat_tables(tabs, promote_options="default"))
    return write_elements(ds, output_path, output_format, metadata,
                          overpass=overpass)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", default=None,
                   help="input path, or '-'/omitted for stdin "
                        "(requires --from)")
    p.add_argument("output", nargs="?", default=None,
                   help="output path, or '-'/omitted for stdout "
                        "(requires --to)")
    # the reference CLI takes --input/--output as named flags
    # (src/main.rs:68-74); accept both spellings
    p.add_argument("--input", dest="input_opt", default=None)
    p.add_argument("--output", dest="output_opt", default=None)
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
    # the reference CLI is a stream processor: output order = input
    # order.  Ray's streaming executor reorders blocks by task
    # completion unless told otherwise.
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = True
    # stdin/stdout piping, mirroring the reference's open_or_stdin
    # (src/readers/mod.rs:60-68) and stdout default (src/main.rs:176-184):
    # stdin spools to a temp file (readers are distributed and need a
    # path); stdout streams the written part files in name order.
    import shutil
    import tempfile

    tmp_root = None
    inp = args.input_opt or args.input or "-"
    outp = args.output_opt or args.output or "-"
    args.input, args.output = inp, outp
    if (args.output_format or "").lower() == "overpass":
        # `--to overpass` is the reference's spelling of the
        # Overpass-header JSON writer (docs/src/usage.md format table)
        args.overpass = True
    try:
        if inp == "-" or outp == "-":
            tmp_root = tempfile.mkdtemp(prefix="skyway_pipe_")
        if inp == "-":
            if not args.input_format:
                print("error: --from FORMAT is required when reading stdin",
                      file=sys.stderr)
                return 2
            inp = f"{tmp_root}/stdin.{args.input_format}"
            with open(inp, "wb") as f:
                shutil.copyfileobj(sys.stdin.buffer, f)
        if outp == "-":
            if not args.output_format:
                print("error: --to FORMAT is required when writing stdout",
                      file=sys.stderr)
                return 2
            outp = f"{tmp_root}/stdout_{args.output_format}"
        sources = []
        for path in args.filters:
            with open(path, encoding="utf-8") as f:
                sources.append(f.read())
        try:
            n = convert(inp, outp, args.input_format,
                        args.output_format, sources, overpass=args.overpass,
                        single_part=(args.output == "-"))
        except (ValueError, FileNotFoundError, NotImplementedError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        finally:
            ray.shutdown()
        if args.output == "-":
            import os

            paths = ([outp] if os.path.isfile(outp) else
                     [os.path.join(outp, name)
                      for name in sorted(os.listdir(outp))])
            for path in paths:
                with open(path, "rb") as f:
                    shutil.copyfileobj(f, sys.stdout.buffer)
            sys.stdout.buffer.flush()
        else:
            print(f"wrote {n} elements to {args.output}")
        return 0
    finally:
        if tmp_root:
            shutil.rmtree(tmp_root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
