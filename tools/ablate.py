"""Roofline ablation harness — regenerates docs/ROOFLINE.md's kernel
budget table in one command (round-3 verdict item 2: the table's evidence
must be reproducible from the tree, like every other claim in this repo).

Variants of the whole-image kernel (ops/pallas_image.py), each measured
with bench.py's in-program-slope methodology (lax.scan over k perturbed
iterations inside ONE dispatch; cluster of trials, not the lucky min):

  full      production kernel, rotated window (wmax class for -s 19)
  nosel     selection+rotation removed (PNGLOSS_ABLATE=nosel)
  noupdate  histogram update removed   (PNGLOSS_ABLATE=noupdate)
  both      both removed = skeleton    (PNGLOSS_ABLATE=both)
  dense     full kernel, dense selection (wmax=0 — the >63-strength path)

Every variant runs in its OWN subprocess: the ablation env var is read at
kernel trace time, and isolating processes keeps in-process program
caches from mixing variants.  nosel/noupdate/both intentionally break
byte parity — they exist only to attribute device time.

Usage:
  python tools/ablate.py                # all variants, markdown table
  python tools/ablate.py --variants full,dense
  python tools/ablate.py --json out.json
Bench only on an idle box (working notes): a concurrent process poisons
timing.  Through the TPU tunnel each variant's first compile can take
1-6 min; the persistent XLA cache makes re-runs fast.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = {
    # name -> dict(ablate=PNGLOSS_ABLATE value, strength=None|int,
    #              wmax=None (class for strength) | int (forced))
    "full": dict(ablate="", strength=None, wmax=None),
    "nosel": dict(ablate="nosel", strength=None, wmax=None),
    "noupdate": dict(ablate="noupdate", strength=None, wmax=None),
    "both": dict(ablate="both", strength=None, wmax=None),
    "dense": dict(ablate="", strength=None, wmax=0),
    # verdict item 3b bound: rotation over a 128-row table (wrong results,
    # right traffic — the leading dense stage dropped, like an int16
    # base+delta split would; the split itself is uncompilable, Mosaic has
    # no 16-bit rotate) — the saving upper-bounds any base+delta split
    "rot128": dict(ablate="rot128", strength=None, wmax=None),
    # verdict item 3a: the new <=15 class vs the old <=31 class at s=15
    "w15_new": dict(ablate="", strength=15, wmax=15),
    "w15_old": dict(ablate="", strength=15, wmax=31),
    # the <=63 class rate (for suite-weighted throughput, verdict item 7)
    "w48": dict(ablate="", strength=48, wmax=63),
    # verdict item 7: strengths 64-99 — would a <=127 rotation class beat
    # the dense path they currently take?
    "s75_dense": dict(ablate="", strength=75, wmax=0),
    "s75_c127": dict(ablate="", strength=75, wmax=127),
    # round-5 verdict item 6: s=19 (the headline strength) sits in the
    # <=31 class (40-row sweep); a <=23 class sweeps 32 rows.  Measured
    # 0.1250 vs 0.1278 → adopted into WMAX_CLASSES, so "w23" now equals
    # "full" at the default strength; "w31" re-measures the retired class
    "w23": dict(ablate="", strength=19, wmax=23),
    "w31": dict(ablate="", strength=19, wmax=31),
    # round-5: the two-correction reciprocal division (pre-fast_div form;
    # production proves operands < 2^16 and drops one correction round
    # per division — see pallas_row._tdiv_pos)
    "slowdiv": dict(ablate="", strength=None, wmax=None,
                    env={"PNGLOSS_FAST_DIV": "0"}),
    # round-5 verdict item 1: pin the skeleton's sub-terms — each variant
    # removes ONE stage on top of the "both" skeleton; "shell" removes
    # them all (the irreducible scan shell: block reads, qrow write,
    # loop control)
    "skel_nosierra": dict(ablate="both,nosierra", strength=None, wmax=None),
    "skel_nosierramath": dict(
        ablate="both,nosierramath", strength=None, wmax=None),
    "skel_noderiv": dict(ablate="both,noderiv", strength=None, wmax=None),
    "skel_nopred": dict(ablate="both,nopred", strength=None, wmax=None),
    "skel_noband": dict(ablate="both,noband", strength=None, wmax=None),
    "shell": dict(ablate="shell", strength=None, wmax=None),
}


def run_worker(variant: str, spec: dict) -> None:
    """One variant's slope measurement; prints a single JSON line."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench
    from pngloss_tpu.ops.optimize_pallas import wmax_class_for

    strength = spec["strength"] if spec["strength"] is not None else int(
        os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))
    # the shared builders keep the 'full' variant trace-identical to
    # bench.py's production program (same persistent-cache key)
    batch, bpp, chunk_mp = bench.make_bench_batch()
    batch_dev = jax.device_put(jnp.asarray(batch))
    wmax = spec["wmax"] if spec["wmax"] is not None \
        else wmax_class_for(strength)
    run_k = bench.make_slope_prog(batch_dev, strength, bpp, wmax=wmax)

    t0 = time.time()
    run_k(1)
    run_k(4)
    compile_s = time.time() - t0
    trials = int(os.environ.get("PNGLOSS_BENCH_TRIALS", "5"))
    slopes = bench._measure_slopes(run_k, trials)
    slope = bench._cluster_slope(slopes)
    print(json.dumps({
        "variant": variant, "slope_s_per_chunk": round(slope, 4),
        "chunk_mp": round(chunk_mp, 3),
        "mp_per_s": round(chunk_mp / slope, 2),
        "wmax": wmax, "strength": strength,
        "compile_plus_first_s": round(compile_s, 1),
        "trial_slopes": [round(s, 4) for s in slopes],
        "backend": jax.default_backend(),
    }))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", default=None, help="internal: variant name")
    ap.add_argument("--variants", default="full,nosel,noupdate,both,dense",
                    help="comma-separated subset of: " + ",".join(VARIANTS))
    ap.add_argument("--json", default=None, help="also write results here")
    args = ap.parse_args()

    if args.worker:
        spec = VARIANTS[args.worker]
        assert os.environ.get("PNGLOSS_ABLATE", "") == spec["ablate"]
        run_worker(args.worker, spec)
        return 0

    results = []
    failed = []
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        # APPEND to PYTHONPATH: replacing it drops /root/.axon_site and the
        # worker loses the axon TPU platform registration (CLAUDE.md quirk)
        prev_pp = os.environ.get("PYTHONPATH", "")
        env = dict(os.environ,
                   PYTHONPATH=REPO + (os.pathsep + prev_pp if prev_pp else ""))
        if spec["ablate"]:
            env["PNGLOSS_ABLATE"] = spec["ablate"]
        else:
            env.pop("PNGLOSS_ABLATE", None)
        env.update(spec.get("env", {}))
        print(f"# measuring {name} ...", file=sys.stderr)
        # one retry per variant: a killed predecessor can wedge the chip
        # for ~60 s (working notes), and losing the whole run to one
        # transient would waste the chip window
        rec = None
        for attempt in (1, 2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", name],
                env=env, capture_output=True, text=True, timeout=1800)
            if r.returncode == 0:
                rec = json.loads(r.stdout.strip().splitlines()[-1])
                break
            print(f"# {name} attempt {attempt} failed (rc={r.returncode}):",
                  file=sys.stderr)
            print(r.stdout + r.stderr, file=sys.stderr)
            if attempt == 1:
                time.sleep(90)
        if rec is None:
            failed.append(name)
            continue
        print(f"#   {name}: {rec['slope_s_per_chunk']} s/chunk "
              f"({rec['mp_per_s']} MP/s)", file=sys.stderr)
        results.append(rec)

    by = {r["variant"]: r for r in results}
    print("\n| variant | s/chunk | attribution |")
    print("|---|---|---|")
    full = by.get("full", {}).get("slope_s_per_chunk")
    for r in results:
        attr = ""
        s = r["slope_s_per_chunk"]
        if full:
            if r["variant"] == "nosel":
                attr = f"rotation+selection ≈ {full - s:.3f}"
            elif r["variant"] == "noupdate":
                attr = f"update ≈ {full - s:.3f}"
            elif r["variant"] == "both":
                attr = f"skeleton ≈ {s:.3f}"
            elif r["variant"] == "dense":
                attr = f"dense selection ≈ +{s - full:.3f} vs rotated"
        print(f"| {r['variant']} (wmax={r['wmax']}) | {s} | {attr} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    if failed:
        print(f"# FAILED variants (twice each): {','.join(failed)}",
              file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
