"""CLI mirroring the reference's subcommands
(/root/reference/metaprofi/metaprofi_main.py:19-282): build / build-ckpt /
update / search / summary, over tokens Parquet instead of FASTA manifests.

Usage:
    python -m metaprofi_ray.cli build  <corpus_dir_or_glob> <index_dir> [--k 8 --h 2 --m 131072 --shards 4]
    python -m metaprofi_ray.cli build-ckpt <corpus_dir> <index_dir> [--partitions 8]
    python -m metaprofi_ray.cli update <index_dir> <new_corpus> <out_dir>
    python -m metaprofi_ray.cli search <index_dir> <query_parquet> [--theta 100 --out hits.parquet]
    python -m metaprofi_ray.cli summary <index_dir>

Owns the Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def _resolve(path: str) -> list[str] | str:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise SystemExit(f"error: no .parquet files found in {path}")
        return files
    g = sorted(glob.glob(path))
    return g if g else path


def _init_ray() -> bool:
    """Init Ray if nobody else owns the session; returns True if we did.

    ``RAY_ADDRESS`` selects the cluster: unset/"local" starts an in-process
    session sized by ``RAY_GRAFT_CPUS``; any other value (``auto``,
    ``ray://head:10001``) ATTACHES to that running cluster — ``num_cpus``
    is deliberately not passed there, the cluster owns its resources.
    This is the multi-node entry guard: the same CLI invocation runs
    single-node locally and cluster-wide under ``ray job submit``
    (scripts/submit.py)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        addr = os.environ.get("RAY_ADDRESS", "local") or "local"
        if addr == "local":
            ray.init(
                address="local",
                num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", os.cpu_count() or 8)),
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        else:
            ray.init(
                address=addr,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="metaprofi_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_cfg(sp):
        sp.add_argument("--k", type=int, default=8)
        sp.add_argument("--h", type=int, default=2)
        sp.add_argument("--m", type=int, default=1 << 17)
        sp.add_argument("--shards", type=int, default=4)

    b = sub.add_parser("build")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    add_cfg(b)

    bs = sub.add_parser("build-seq")
    bs.add_argument("corpus")
    bs.add_argument("index_dir")
    add_cfg(bs)

    bc = sub.add_parser("build-ckpt")
    bc.add_argument("corpus")
    bc.add_argument("index_dir")
    bc.add_argument("--partitions", type=int, default=8)
    add_cfg(bc)

    u = sub.add_parser("update")
    u.add_argument("index_dir")
    u.add_argument("new_corpus")
    u.add_argument("out_dir")

    us = sub.add_parser("update-seq")
    us.add_argument("index_dir")
    us.add_argument("new_corpus")
    us.add_argument("out_dir")

    rm = sub.add_parser("remove",
                        help="write a new index with the named sources "
                             "removed (only their srcbucket dirs are "
                             "rewritten; the rest hardlink)")
    rm.add_argument("index_dir")
    rm.add_argument("sources", help="comma-separated source names")
    rm.add_argument("out_dir")

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("queries", nargs="?", default=None,
                   help="query parquet (omit when using --seq)")
    s.add_argument("--seq", default=None,
                   help="single inline query: comma-separated token ids "
                        "(reference search_index -s analogue)")
    s.add_argument("--theta", type=int, default=100)
    s.add_argument("--out", default=None)
    s.add_argument("--streaming", action="store_true",
                   help="stream the bank table instead of broadcasting it "
                        "(for indexes whose banks exceed worker memory)")
    s.add_argument("--sources", default=None,
                   help="comma-separated source names to restrict the "
                        "(streaming) search to; prunes whole srcbucket "
                        "directories at the read")
    s.add_argument("--distributed-probe", action="store_true",
                   help="build the probe set as a Dataset (parallel prep, "
                        "per-bucket probe slices) — the >>100k-query "
                        "streaming mode; implies --streaming")
    s.add_argument("--theta-compat", choices=["exact", "reference"],
                   default="exact",
                   help="threshold arithmetic: integer-exact (default) or "
                        "the reference's float form for parity comparisons")

    sm = sub.add_parser("summary")
    sm.add_argument("index_dir")

    a = p.parse_args(argv)
    from .config import SketchConfig

    owns_ray = False

    if a.cmd == "build":
        owns_ray = _init_ray()
        from .pipelines.build import build_from_parquet

        cfg = SketchConfig(k=a.k, h=a.h, m=a.m, shards=a.shards)
        out = build_from_parquet(_resolve(a.corpus), cfg, a.index_dir)
        print(f"built index at {out}")
    elif a.cmd == "build-seq":
        owns_ray = _init_ray()
        from .pipelines.build import build_seq_from_parquet

        cfg = SketchConfig(k=a.k, h=a.h, m=a.m, shards=a.shards)
        out = build_seq_from_parquet(_resolve(a.corpus), cfg, a.index_dir)
        print(f"built sequence-level index at {out}")
    elif a.cmd == "build-ckpt":
        owns_ray = _init_ray()
        from .state.checkpoint import build_with_checkpoints

        cfg = SketchConfig(k=a.k, h=a.h, m=a.m, shards=a.shards)
        rep = build_with_checkpoints(_resolve(a.corpus), cfg, a.index_dir, a.partitions)
        print(f"built={rep['built']} resumed={rep['resumed']} at {a.index_dir}")
    elif a.cmd == "update":
        owns_ray = _init_ray()
        from .pipelines.update import update_from_parquet

        out = update_from_parquet(a.index_dir, _resolve(a.new_corpus), a.out_dir)
        print(f"updated index at {out}")
    elif a.cmd == "update-seq":
        owns_ray = _init_ray()
        from .pipelines.build import as_sequence_level, read_tokens
        from .pipelines.update import update_index

        out = update_index(
            a.index_dir, as_sequence_level(read_tokens(_resolve(a.new_corpus))), a.out_dir
        )
        print(f"updated sequence-level index at {out}")
    elif a.cmd == "remove":
        owns_ray = _init_ray()
        from .pipelines.update import remove_sources

        out = remove_sources(
            a.index_dir,
            [s.strip() for s in a.sources.split(",") if s.strip()],
            a.out_dir,
        )
        print(f"removed sources; new index at {out}")
    elif a.cmd == "search":
        owns_ray = _init_ray()
        import pyarrow as pa

        from .pipelines.query import (
            format_report,
            query_index,
            query_index_streaming,
            query_table,
        )

        if a.seq is not None:
            tokens = [int(t) for t in a.seq.split(",") if t.strip()]
            q = pa.table(
                {"query_id": ["seq-0"],
                 "tokens": pa.array([tokens], pa.list_(pa.int32()))}
            )
            tbl = query_table(a.index_dir, q, theta=a.theta,
                              theta_compat=a.theta_compat)
            sys.stdout.write(format_report(tbl, a.theta))
        else:
            if a.queries is None:
                p.error("search needs a query parquet path or --seq")
            import ray.data as rd

            if a.distributed_probe:
                from .pipelines.query import query_index_streaming_distributed

                hits = query_index_streaming_distributed(
                    a.index_dir, rd.read_parquet(a.queries), theta=a.theta,
                    theta_compat=a.theta_compat,
                    sources=a.sources.split(",") if a.sources else None,
                )
            elif a.streaming:
                import pyarrow.parquet as pq

                hits = query_index_streaming(
                    a.index_dir, pq.read_table(a.queries), theta=a.theta,
                    theta_compat=a.theta_compat,
                    sources=a.sources.split(",") if a.sources else None,
                )
            else:
                hits = query_index(
                    a.index_dir, rd.read_parquet(a.queries), theta=a.theta,
                    theta_compat=a.theta_compat,
                )
            if a.out:
                hits.write_parquet(a.out)
                print(f"hits written to {a.out}")
            else:
                tbl = pa.Table.from_pandas(hits.to_pandas())
                sys.stdout.write(format_report(tbl, a.theta))
    elif a.cmd == "summary":
        from .pipelines.summary import format_summary

        sys.stdout.write(format_summary(a.index_dir))
    if owns_ray:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
