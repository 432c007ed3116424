"""CLI — argument parity with the reference
(/root/reference/src/lib.rs:12-37):

    python -m mvt_wrangler_ray INPUT.pmtiles OUTPUT.pmtiles \
        [--filter f.geojson] [--name N] [--description D] [--attribution A]

Owns its Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="mvt_wrangler_ray",
        description="Rewrite a PMTiles archive of vector tiles with "
                    "spatially-scoped expression filters (Ray-Data engine).")
    p.add_argument("input", help="Input PMTiles file")
    p.add_argument("output", help="Output PMTiles file (overwritten if exists)")
    p.add_argument("-f", "--filter", help="GeoJSON filter collection (see FILTERING semantics)")
    p.add_argument("-n", "--name", help="Tileset name (metadata override)")
    p.add_argument("-N", "--description", help="Tileset description override")
    p.add_argument("-A", "--attribution", help="Attribution override")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    # validation parity with lib.rs:41-65
    if not os.path.exists(args.input):
        p.error(f"Input file does not exist: {args.input}")
    if not args.output.endswith(".pmtiles"):
        p.error("Output file must have .pmtiles extension")
    if os.path.exists(args.output):
        os.remove(args.output)
    filter_src = None
    if args.filter:
        if not os.path.exists(args.filter):
            p.error(f"Filter file does not exist: {args.filter}")
        with open(args.filter) as f:
            filter_src = f.read()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from .config import EngineConfig
        from .pipelines.archive import wrangle_pmtiles

        cfg = EngineConfig(name=args.name, description=args.description,
                           attribution=args.attribution)
        summary = wrangle_pmtiles(args.input, args.output, filter_src, cfg)
        print(f"Wrote {summary['tiles_written']} transformed tiles to {args.output}")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
