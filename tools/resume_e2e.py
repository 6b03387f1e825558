"""End-to-end kill-and-resume drill for the `run_job.py` entry points
(r4 verdict item 7 — the north rule's "restarted ray job" clause).

For each lane it:

1. runs the job uninterrupted into sink A (the golden output);
2. launches the SAME job into sink B, SIGKILLs the whole driver process
   group mid-run (after the first sink file lands, i.e. real partial
   output exists), then re-submits it to completion;
3. asserts the resumed output is BIT-identical to the uninterrupted run
   (same file set, same bytes per file) — fused lanes resume via atomic
   idempotent per-span sink files, checkpointed lanes via the lineage
   manifest (the rerun must also report skipped > 0).

Usage: python tools/resume_e2e.py [--rows 200000] [--json PATH]
Scratch lives under /tmp; each invocation starts clean.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUN_JOB = os.path.join(REPO, "tools", "run_job.py")


def _file_digests(root: str) -> dict[str, str]:
    out = {}
    for p in sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)):
        with open(p, "rb") as fh:
            out[os.path.relpath(p, root)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def _job_cmd(inp: str, out: str, lane: str, num_cpus: int) -> list[str]:
    cmd = [
        sys.executable, RUN_JOB, "--input", inp, "--output", out,
        "--lane", lane, "--num-cpus", str(num_cpus), "--partitions", "32",
    ]
    if lane.startswith("fused-"):
        cmd.append("--assume-clustered")
    return cmd


def _run(cmd: list[str], **env_extra) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local", **env_extra)
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if res.returncode != 0:
        raise RuntimeError(f"job failed: {res.stderr[-2000:]}")
    return json.loads(res.stdout.strip().splitlines()[-1])


def _run_crashing(cmd: list[str], after_commits: int) -> int:
    """Run the job with the GRAFT_CRASH_AFTER_COMMITS fault hook armed: the
    driver hard-exits (os._exit 137) after committing `after_commits`
    partitions to the manifest — a deterministic preempted-driver. Returns
    the exit code (must be nonzero)."""
    env = dict(os.environ, RAY_ADDRESS="local",
               GRAFT_CRASH_AFTER_COMMITS=str(after_commits))
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    return res.returncode


def _first_sink_file(watch_dir: str) -> bool:
    return bool(glob.glob(os.path.join(watch_dir, "**", "*.parquet"),
                          recursive=True))


def _run_and_kill(cmd: list[str], watch_dir: str, grace_s: float) -> bool:
    """Start the job in its own process group; SIGKILL the group once the
    first sink parquet file appears plus a small grace. Returns True if we
    actually killed it mid-run."""
    ready = _first_sink_file
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env, start_new_session=True,
    )
    killed = False
    deadline = time.time() + 300
    try:
        while proc.poll() is None and time.time() < deadline:
            if ready(watch_dir):
                time.sleep(grace_s)
                if proc.poll() is None:
                    os.killpg(proc.pid, signal.SIGKILL)
                    killed = True
                break
            time.sleep(0.01)
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=60)
    # the killed driver's ray session dies with the process group; give the
    # raylet a moment to release the plasma socket before the resume run
    time.sleep(2.0)
    return killed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--grace", type=float, default=0.3,
                    help="seconds between first sink file and SIGKILL")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    base = "/tmp/resume_e2e"
    shutil.rmtree(base, ignore_errors=True)
    inp = os.path.join(base, "input")
    os.makedirs(inp, exist_ok=True)

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from getml_community_ray.sources.synth import generate_sequences

    generate_sequences(inp, n_rows=args.rows, n_shards=8, seed=23,
                       with_tokens=False)
    ray.shutdown()

    report: dict[str, dict] = {}

    # ---- fused-both: idempotent per-span sink files --------------------
    lane = "fused-both"
    gold_dir, kill_dir = os.path.join(base, "gold"), os.path.join(base, "resumed")
    t0 = time.perf_counter()
    gold = _run(_job_cmd(inp, gold_dir, lane, args.num_cpus))
    gold_wall = time.perf_counter() - t0
    killed = _run_and_kill(_job_cmd(inp, kill_dir, lane, args.num_cpus),
                           kill_dir, args.grace)
    partial = len(_file_digests(kill_dir))
    resumed = _run(_job_cmd(inp, kill_dir, lane, args.num_cpus))
    dg, dr = _file_digests(gold_dir), _file_digests(kill_dir)
    report[lane] = {
        "killed_mid_run": killed,
        "partial_files_at_kill": partial,
        "files": len(dg),
        "rows_out_gold": gold["rows_out"],
        "rows_out_resumed": resumed["rows_out"],
        "bit_identical": dg == dr,
        "gold_wall_s": round(gold_wall, 2),
    }
    # killed must be True: a run that finished before the SIGKILL landed
    # proves only idempotent rerun, not resume — fail the drill so it is
    # re-run with more rows / smaller grace
    ok = (dg == dr and gold["rows_out"] == resumed["rows_out"]
          and len(dg) > 0 and killed)
    print(f"{lane}: killed={killed} partial_files={partial} "
          f"files={len(dg)} bit_identical={dg == dr}")

    # ---- checkpointed decomposable: manifest lineage skip --------------
    lane = "decomposable"
    gold_dir = os.path.join(base, "gold_ckpt")
    kill_dir = os.path.join(base, "resumed_ckpt")
    gold = _run(_job_cmd(inp, gold_dir, lane, args.num_cpus))
    # deterministic preempted driver: hard-exit after 5 manifest commits
    rc = _run_crashing(_job_cmd(inp, kill_dir, lane, args.num_cpus),
                       after_commits=5)
    partial = len(_file_digests(kill_dir))
    with open(os.path.join(kill_dir, "_manifest.json")) as fh:
        committed_at_crash = len(json.load(fh).get("partitions", {}))
    resumed = _run(_job_cmd(inp, kill_dir, lane, args.num_cpus))
    dg, dr = _file_digests(gold_dir), _file_digests(kill_dir)
    # manifests carry absolute paths/timestamps — compare data files only
    report[lane] = {
        "crash_exit_code": rc,
        "committed_at_crash": committed_at_crash,
        "partial_files_at_crash": partial,
        "files": len(dg),
        "rows_out_gold": gold["rows_out"],
        "rows_out_resumed": resumed["rows_out"],
        "resume_skipped": resumed["skipped"],
        "resume_computed": resumed["computed"],
        "bit_identical": dg == dr,
    }
    ok = ok and dg == dr and gold["rows_out"] == resumed["rows_out"]
    ok = ok and rc != 0 and committed_at_crash > 0
    ok = ok and resumed["skipped"] == committed_at_crash
    ok = ok and resumed["computed"] + resumed["skipped"] == 32
    print(f"{lane}: crash_rc={rc} committed_at_crash={committed_at_crash} "
          f"files={len(dg)} skipped={resumed['skipped']} "
          f"computed={resumed['computed']} bit_identical={dg == dr}")

    report["ok"] = ok
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
