#!/usr/bin/env python
"""Submit a metaprofi_ray CLI invocation as a Ray job (multi-node entry).

Two modes:

* cluster — ``--address http://<head>:8265`` (or ``$RAY_JOB_ADDRESS``):
  shells out to ``ray job submit`` with the repo as the job's
  ``--working-dir`` so every worker imports ``metaprofi_ray`` from the
  shipped snapshot.  Inside the job, ``RAY_ADDRESS=auto`` attaches the CLI
  to the hosting cluster (see ``cli._init_ray``'s address guard).

* local smoke — ``--local`` (or no address): runs the identical CLI inline
  in a local Ray session.  CI and this sandbox exercise exactly the same
  code path the cluster job runs; only the ray.init address differs.

Examples:
    python scripts/submit.py --local -- build /data/corpus /tmp/idx
    python scripts/submit.py --address http://head:8265 -- \\
        build-ckpt /data/corpus /mnt/shared/idx --partitions 64

Operational notes for a real cluster (N and 4N nodes, per the scaling
criterion): the corpus and index paths must be cluster-visible storage;
``build-ckpt`` is the right entry (per-partition checkpoints make the job
resumable after preemption); object-store spilling should point at local
NVMe via ``ray start --system-config``.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="submit.py",
        description="Run a metaprofi_ray CLI command locally or as a Ray job",
    )
    ap.add_argument(
        "--address",
        default=os.environ.get("RAY_JOB_ADDRESS", ""),
        help="Ray job server address (http://head:8265); empty = run locally",
    )
    ap.add_argument(
        "--local", action="store_true",
        help="force inline execution in a local Ray session",
    )
    ap.add_argument(
        "cli_args", nargs=argparse.REMAINDER,
        help="metaprofi_ray CLI arguments (prefix with --)",
    )
    a = ap.parse_args(argv)
    args = [x for x in a.cli_args if x != "--"]
    if not args:
        ap.error("no CLI command given; e.g. -- build <corpus> <index_dir>")

    if a.local or not a.address:
        from metaprofi_ray.cli import main as cli_main

        return cli_main(args)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        "ray", "job", "submit",
        "--address", a.address,
        "--working-dir", repo_root,
        "--entrypoint-num-cpus", "1",
        "--",
        sys.executable, "-m", "metaprofi_ray.cli", *args,
    ]
    env = dict(os.environ, RAY_ADDRESS="auto")
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
