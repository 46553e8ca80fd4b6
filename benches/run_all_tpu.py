"""One-shot TPU benchmark capture: runs every harness against the real chip
and records the JSONs under benches/results/ (committed to the repo so the
numbers exist in-tree — VERDICT round-1 items 1 and 3).

Stages (each skippable if its result file already exists, so the run is
resumable across TPU hiccups):
  1. bench_suite at the reference degree points [1,100,500,1000,2500]
     plus 16383 and 65535 (2^14-1, 2^16-1) — the five Criterion-mirror suites.
  2. ceremony at 2^20 (setup-time cliff measurement).
  3. headline MSM bench at 2^18 and 2^20 (bench.py path, fixed-base tables).
  4. profile_fb stage breakdown at the largest benched n.

Usage: python benches/run_all_tpu.py [--force] [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benches", "results")


def probe_tpu(timeout: int = 300) -> bool:
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "x = jnp.ones((8, 128), jnp.uint32)\n"
        "s = float(np.asarray(x + x).sum())\n"
        "print('TPU', d[0].platform, d[0].device_kind, s)\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", code], capture_output=True, text=True,
            timeout=timeout, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        return False
    ok = out.returncode == 0 and "TPU" in out.stdout
    print(out.stdout.strip() or out.stderr.strip().splitlines()[-1:], file=sys.stderr)
    return ok


def run_stage(name: str, cmd: list[str], outfile: str, force: bool,
              timeout: int = 7200) -> bool:
    path = os.path.join(RESULTS, outfile) if outfile else None
    if path and os.path.exists(path) and not force:
        print(f"[run_all] {name}: {outfile} exists, skipping", file=sys.stderr)
        return True
    print(f"[run_all] {name}: {' '.join(cmd)}", file=sys.stderr)
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, cwd=ROOT)
    except subprocess.TimeoutExpired:
        print(f"[run_all] {name}: TIMEOUT after {timeout}s", file=sys.stderr)
        return False
    sys.stderr.write(out.stderr[-4000:])
    if out.returncode != 0:
        print(f"[run_all] {name}: FAILED rc={out.returncode}", file=sys.stderr)
        return False
    # last stdout line is the JSON payload for single-line tools; bench_suite
    # writes its own --json file
    if path and out.stdout.strip():
        payload = out.stdout.strip().splitlines()[-1]
        try:
            json.loads(payload)
        except ValueError:
            payload = json.dumps({"raw": out.stdout.strip()[-2000:]})
        with open(path, "w") as f:
            f.write(payload + "\n")
    print(f"[run_all] {name}: done in {time.time()-t0:.0f}s -> {outfile}", file=sys.stderr)
    return True


def main() -> int:
    force = "--force" in sys.argv
    quick = "--quick" in sys.argv
    os.makedirs(RESULTS, exist_ok=True)

    if not probe_tpu():
        print("[run_all] TPU probe failed — aborting", file=sys.stderr)
        return 2

    py = sys.executable
    ok = True

    # 1. five-suite Criterion mirror at the reference degree points; the
    # TPU-scale extension runs commit+evaluate+prove only (every (suite,
    # degree) pair is its own multi-minute AOT compile on the tunnel)
    degrees = "1,100,500,1000,2500"
    suite_json = os.path.join(RESULTS, "bench_suite.json")
    if force or not os.path.exists(suite_json):
        ok &= run_stage(
            "bench_suite",
            [py, "-u", "benches/bench_suite.py", "--degrees", degrees,
             "--json", suite_json],
            "",  # bench_suite writes its own file
            force,
        ) and os.path.exists(suite_json)
    else:
        print("[run_all] bench_suite: exists, skipping", file=sys.stderr)
    if not quick:
        scale_json = os.path.join(RESULTS, "bench_suite_scale.json")
        if force or not os.path.exists(scale_json):
            ok &= run_stage(
                "bench_suite_scale",
                [py, "-u", "benches/bench_suite.py", "commit", "evaluate", "prove",
                 "--degrees", "16383,65535", "--json", scale_json],
                "",
                force,
                timeout=10800,
            ) and os.path.exists(scale_json)
        else:
            print("[run_all] bench_suite_scale: exists, skipping", file=sys.stderr)

    # 2. ceremony scale
    n_cer = 1 << (16 if quick else 20)
    ok &= run_stage("ceremony", [py, "-u", "benches/ceremony.py", str(n_cer)],
                    f"ceremony_{n_cer}.json", force)

    # 3. headline MSM at scale
    for lg in ([16] if quick else [18, 20]):
        ok &= run_stage(f"msm_2^{lg}", [py, "-u", "bench.py", str(1 << lg)],
                        f"msm_{1 << lg}.json", force, timeout=10800)

    # 4. NTT throughput (BASELINE north-star metric)
    ok &= run_stage("bench_ntt", [py, "-u", "benches/bench_ntt.py"],
                    "bench_ntt.json", force)

    # 5. hardware smoke of every Pallas kernel entry
    ok &= run_stage("bench_smoke", [py, "-u", "benches/bench_smoke.py"],
                    "bench_smoke.json", force)

    # 6. stage profile of the production lazy pipeline
    ok &= run_stage("profile_lazy25",
                    [py, "-u", "benches/profile_lazy25.py", "65536"],
                    "profile_lazy25_65536.json", force)

    print(f"[run_all] {'ALL OK' if ok else 'SOME STAGES FAILED'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
