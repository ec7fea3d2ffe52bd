"""Serial TPU job queue with retry — evidence-landing harness.

The single TPU chip is shared by every heavy run, and the backend kills
roughly half of long runs ("TPU worker process crashed", VERDICT r3 weak
#1). This runner executes a list of jobs SERIALLY (one TPU process at a
time), each in its own subprocess with a wall-clock timeout and
retry-with-backoff. Jobs are expected to be resumable (Arnoldi/Lanczos
checkpoints, append-mode sweep outputs), so a retry costs only the work
since the last checkpoint.

Usage:
    python tools/run_queue.py jobs.json [--log-dir artifacts/logs]

jobs.json: [{"name": ..., "cmd": [...], "timeout": s, "attempts": n,
             "done_file": path (skip the job if it exists)}, ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_responsive(wait_s: int = 300) -> bool:
    """After a TPU worker crash the NEXT process can wedge forever in backend
    init while a later one succeeds — probe with a fresh throwaway process
    until the device answers (observed failure mode, round 4)."""
    deadline = time.time() + wait_s
    while time.time() < deadline:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "assert float(jnp.arange(8.0).sum()) == 28.0"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(10)
    return False


def run_job(job: dict, log_dir: str) -> dict:
    name = job["name"]
    attempts = int(job.get("attempts", 3))
    timeout = int(job.get("timeout", 3600))
    # kill an attempt whose log grows by nothing for this long (wedged
    # backend init / hung transfer) — checkpointed jobs resume cheaply
    stall = int(job.get("stall_timeout", 900))
    done_file = job.get("done_file")
    if done_file and os.path.exists(os.path.join(REPO, done_file)):
        print(f"[queue] {name}: done_file exists, skipping", flush=True)
        return {"name": name, "status": "skipped"}

    log_path = os.path.join(log_dir, f"{name}.log")
    for attempt in range(1, attempts + 1):
        if not _tpu_responsive():
            print(f"[queue] {name}: TPU unresponsive before attempt "
                  f"{attempt}, proceeding anyway", flush=True)
        t0 = time.time()
        print(f"[queue] {name}: attempt {attempt}/{attempts} "
              f"(timeout {timeout}s, stall {stall}s) -> {log_path}", flush=True)
        with open(log_path, "a") as log:
            log.write(f"\n===== attempt {attempt} @ {time.strftime('%H:%M:%S')} =====\n")
            log.flush()
            proc = subprocess.Popen(
                job["cmd"], stdout=log, stderr=subprocess.STDOUT, cwd=REPO,
            )
            last_size = os.path.getsize(log_path)
            last_change = time.time()
            rc = None
            while True:
                try:
                    rc = proc.wait(timeout=20)
                    break
                except subprocess.TimeoutExpired:
                    pass
                now = time.time()
                size = os.path.getsize(log_path)
                if size != last_size:
                    last_size, last_change = size, now
                if now - t0 > timeout:
                    proc.kill()
                    rc = -9
                    log.write(f"\n[queue] TIMEOUT after {timeout}s\n")
                    break
                if now - last_change > stall:
                    proc.kill()
                    rc = -17
                    log.write(f"\n[queue] STALLED (no output {stall}s)\n")
                    break
            if rc is None:
                rc = proc.wait()
        dt = time.time() - t0
        if rc == 0:
            print(f"[queue] {name}: OK in {dt:.0f}s", flush=True)
            return {"name": name, "status": "ok", "seconds": dt,
                    "attempts": attempt}
        print(f"[queue] {name}: rc={rc} after {dt:.0f}s", flush=True)
        if attempt < attempts:
            time.sleep(15 * attempt)
    return {"name": name, "status": "failed", "attempts": attempts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jobs")
    ap.add_argument("--log-dir", default="artifacts/logs")
    ap.add_argument("--status-file", default="artifacts/queue_status.json")
    args = ap.parse_args()

    with open(args.jobs) as f:
        jobs = json.load(f)
    log_dir = os.path.join(REPO, args.log_dir)
    os.makedirs(log_dir, exist_ok=True)
    status_path = os.path.join(REPO, args.status_file)
    os.makedirs(os.path.dirname(status_path), exist_ok=True)

    results = []
    for job in jobs:
        results.append(run_job(job, log_dir))
        with open(status_path, "w") as f:
            json.dump(results, f, indent=1)
    n_ok = sum(r["status"] in ("ok", "skipped") for r in results)
    print(f"[queue] finished: {n_ok}/{len(results)} ok", flush=True)


if __name__ == "__main__":
    main()
