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


def _init_ray(num_cpus):
    """Attach to an existing cluster when one is advertised (the
    `ray job submit` path sets RAY_ADDRESS to the cluster address), else
    start a local instance. num_cpus only applies to a local start —
    a real cluster's size is the cluster's business."""
    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS", "local")
    kw = {"include_dashboard": False, "logging_level": "ERROR"}
    if addr in ("local", ""):
        ray.init(address="local", num_cpus=num_cpus, **kw)
    else:
        ray.init(address=addr, **kw)

def _main_images(argv):
    """`python -m mvt_wrangler_ray images INPUT OUT_DIR [...]` — the
    flagship image pipeline: read images table → geotag → cells → tiles →
    filter join → resumable range-partitioned parquet with lineage."""
    p = argparse.ArgumentParser(prog="mvt_wrangler_ray images")
    p.add_argument("input", help="images table (parquet dir/file or .lance)")
    p.add_argument("out_dir", help="output directory (range partitions + lineage)")
    p.add_argument("-f", "--filter", help="GeoJSON filter collection")
    p.add_argument("-z", "--zoom", type=int, default=12)
    p.add_argument("-p", "--partitions", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--lossy-recode", type=int, default=0, metavar="STEP",
                   help="re-encode payloads with the LJPG transform codec "
                        "at this quantizer step (adds ljpg_bytes + psnr_db "
                        "columns; every row must hold PSNR >= 40 dB)")
    p.add_argument("--allow-fake-codecs", action="store_true",
                   help="permit the deterministic FAKE pixel decode for "
                        "payloads the real codecs can't parse (synthetic "
                        "fixtures only). The CLI defaults to STRICT codec "
                        "mode: real-data users pointing this at JPEG/WebP "
                        "payloads without PIL get a loud error, never "
                        "plausible-but-wrong pseudo pixels")
    args = p.parse_args(argv)
    if args.lossy_recode and not 1 <= args.lossy_recode <= 5:
        # worst-case PSNR for quantizer step s is 20*log10(510/s); the
        # advertised per-row invariant "psnr_db >= 40" only holds to s=5
        p.error("--lossy-recode STEP must be in 1..5 (PSNR >= 40 dB "
                f"guarantee breaks at step {args.lossy_recode})")
    filter_src = None
    if args.filter:
        with open(args.filter) as f:
            filter_src = f.read()

    import ray

    _init_ray(args.num_cpus)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from .config import EngineConfig
        from .pipelines.wrangle import wrangle_write
        from .sources.images import read_images, validate_images_schema

        ds = read_images(args.input)
        validate_images_schema(ds)
        if args.lossy_recode:
            from .stages.image import LossyRecodeStage

            # strict resolved HERE on the driver (stage __init__ runs in
            # worker processes that don't inherit driver env vars):
            # strict unless the user explicitly opted into fake codecs
            ds = ds.map_batches(
                LossyRecodeStage, batch_format="pyarrow", batch_size=256,
                concurrency=(1, 4),
                fn_constructor_kwargs={"step": args.lossy_recode,
                                       "strict": not args.allow_fake_codecs})
        recs = wrangle_write(ds, args.out_dir, EngineConfig(zoom=args.zoom),
                             filter_geojson=filter_src,
                             num_partitions=args.partitions,
                             resume=not args.no_resume,
                             config_extra={"lossy_recode": args.lossy_recode})
        total = sum(r["rows"] for r in recs)
        print(f"Wrote {total} rows across {len(recs)} partitions to {args.out_dir}")
    finally:
        ray.shutdown()
    return 0


def _main_corpus(argv):
    """`python -m mvt_wrangler_ray corpus INPUT OUT_DIR [...]` — the
    composed corpus-cleaning pipeline (quality gate → language gate →
    exact + near dedup) to a resumable range-partitioned parquet sink."""
    import json

    p = argparse.ArgumentParser(prog="mvt_wrangler_ray corpus")
    p.add_argument("input", help="documents table (parquet file or dir "
                                 "with doc_id + text columns)")
    p.add_argument("out_dir", help="output directory (range partitions + lineage)")
    p.add_argument("--min-quality", type=float, default=0.2)
    p.add_argument("--langs", default="en",
                   help="comma-separated language allowlist")
    p.add_argument("--near-dup-threshold", type=float, default=0.7)
    p.add_argument("--decontaminate", metavar="EVAL_PARQUET",
                   help="benchmark-decontamination pass: drop survivors "
                        "sharing any n-gram window with the eval table "
                        "(parquet with doc_id + text)")
    p.add_argument("--decontaminate-ngram", type=int, default=5,
                   help="window width for --decontaminate (words)")
    p.add_argument("-p", "--partitions", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    _init_ray(args.num_cpus)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        import ray.data as rd

        from .pipelines.corpus import clean_corpus
        from .state.lineage import config_fingerprint, write_partitioned

        ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
        langs = tuple(s.strip() for s in args.langs.split(",") if s.strip())
        survivors, stats = clean_corpus(
            ds, min_quality=args.min_quality, langs=langs,
            near_dup_threshold=args.near_dup_threshold)
        if args.decontaminate:
            import pyarrow as _pa

            from .stages.dedup import ngram_contamination
            from .stages.shuffle import bucketed_key_semi_join

            survivors = survivors.materialize()  # two consumers below
            ev = rd.read_parquet(args.decontaminate,
                                 columns=["doc_id", "text"])
            cont = ngram_contamination(
                survivors, ev, n=args.decontaminate_ngram).map_batches(
                lambda b: b.filter(
                    _pa.compute.equal(b["contaminated"], 1))
                .select(["doc_id"]),
                batch_format="pyarrow")
            cont = cont.materialize()  # counted AND joined below
            stats["contaminated_dropped"] = cont.count()
            survivors = bucketed_key_semi_join(survivors, cont, "doc_id",
                                               anti=True)
            stats["output"] = stats["output"] - stats[
                "contaminated_dropped"]
        chash = config_fingerprint(
            {"min_quality": args.min_quality, "langs": list(langs),
             "near_dup_threshold": args.near_dup_threshold,
             "decontaminate": bool(args.decontaminate),
             "decontaminate_ngram": args.decontaminate_ngram})
        recs = write_partitioned(survivors, args.out_dir, key="doc_id",
                                 num_partitions=args.partitions,
                                 metadata={"stats": stats},
                                 resume=not args.no_resume,
                                 config_hash=chash)
        total = sum(r["rows"] for r in recs)
        print(json.dumps(stats))
        print(f"Wrote {total} surviving documents across {len(recs)} "
              f"partitions to {args.out_dir}")
    finally:
        ray.shutdown()
    return 0


def _main_pack(argv):
    """`python -m mvt_wrangler_ray pack INPUT OUT_DIR [-L SEQ_LEN]` —
    sequence packing (documents → fixed-length token sequences with
    document-boundary segment rows) to the resumable range-partitioned
    parquet sink, keyed by seq_id so a dataloader can read sequence
    ranges independently."""
    import json

    p = argparse.ArgumentParser(prog="mvt_wrangler_ray pack")
    p.add_argument("input", help="documents table (parquet file or dir "
                                 "with doc_id + text columns)")
    p.add_argument("out_dir", help="output directory (range partitions + lineage)")
    p.add_argument("-L", "--seq-len", type=int, default=2048,
                   help="tokens per packed sequence")
    p.add_argument("--bucket-ids", type=int, default=65536,
                   help="doc_id range width of one prefix-sum bucket")
    p.add_argument("-p", "--partitions", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    _init_ray(args.num_cpus)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        import ray.data as rd

        from .stages.pack import pack_sequences
        from .state.lineage import config_fingerprint, write_partitioned

        ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
        segs = pack_sequences(ds, seq_len=args.seq_len,
                              bucket_ids=args.bucket_ids)
        chash = config_fingerprint(
            {"seq_len": args.seq_len, "bucket_ids": args.bucket_ids})
        recs = write_partitioned(segs, args.out_dir, key="seq_id",
                                 num_partitions=args.partitions,
                                 metadata={"seq_len": args.seq_len},
                                 resume=not args.no_resume,
                                 config_hash=chash)
        total = sum(r["rows"] for r in recs)
        print(json.dumps({"segments": total, "partitions": len(recs),
                          "seq_len": args.seq_len}))
        print(f"Wrote {total} sequence segments across {len(recs)} "
              f"partitions to {args.out_dir}")
    finally:
        ray.shutdown()
    return 0


def _main_dedup_segments(argv):
    """`dedup-segments INPUT OUT_DIR`: C4/Lee-et-al segment-level exact
    dedup with document reassembly (stages/dedup.segment_dedup) into the
    resumable lineage-partitioned sink — a killed run skips finished
    doc-id partitions on rerun."""
    p = argparse.ArgumentParser(prog="mvt_wrangler_ray dedup-segments")
    p.add_argument("input", help="documents parquet (doc_id, text)")
    p.add_argument("out_dir")
    p.add_argument("-S", "--seg-words", type=int, default=20,
                   help="words per dedup segment")
    p.add_argument("-p", "--partitions", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import json

    import ray

    _init_ray(args.num_cpus)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        import ray.data as rd

        from .stages.dedup import segment_dedup
        from .state.lineage import config_fingerprint, write_partitioned

        ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
        kept = segment_dedup(ds, seg_words=args.seg_words)
        chash = config_fingerprint({"seg_words": args.seg_words})
        recs = write_partitioned(kept, args.out_dir, key="doc_id",
                                 num_partitions=args.partitions,
                                 metadata={"seg_words": args.seg_words},
                                 resume=not args.no_resume,
                                 config_hash=chash)
        total = sum(r["rows"] for r in recs)
        print(json.dumps({"documents": total, "partitions": len(recs),
                          "seg_words": args.seg_words}))
        print(f"Wrote {total} reassembled documents across {len(recs)} "
              f"partitions to {args.out_dir}")
    finally:
        ray.shutdown()
    return 0


def main(argv=None):
    import sys as _sys

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    if argv and argv[0] == "images":
        return _main_images(argv[1:])
    if argv and argv[0] == "corpus":
        return _main_corpus(argv[1:])
    if argv and argv[0] == "pack":
        return _main_pack(argv[1:])
    if argv and argv[0] == "dedup-segments":
        return _main_dedup_segments(argv[1:])
    p = argparse.ArgumentParser(
        prog="mvt_wrangler_ray",
        description="Rewrite a PMTiles archive of vector tiles with "
                    "spatially-scoped expression filters (Ray-Data engine); "
                    "or run the image pipeline: "
                    "`python -m mvt_wrangler_ray images INPUT OUT_DIR`.")
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

    _init_ray(args.num_cpus)
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
