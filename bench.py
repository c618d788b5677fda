"""Throughput benchmark: megapixels/sec of the batched optimizer at -s 19.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.json north star): 10,000 1MP-images/sec on v5e-8,
i.e. 1,250 1MP-images/sec/chip — vs_baseline is measured against the
per-chip share so the number is honest on a single chip.

Measurement: DEVICE compute rate by IN-PROGRAM slopes — one jitted
program runs the production optimizer k times via lax.scan (inputs
perturbed per step so XLA cannot CSE the iterations), its outputs
sum-reduced to one scalar; slope = (t(prog_k) - t(prog_1)) / (k - 1).
The input batch is `jax.device_put` ONCE before the timed loop. Keeping
the repetition inside a single dispatch matters on this box: every
dispatch RPC through the TPU tunnel costs a constant ~25 ms (measured:
a trivial jitted op's dispatch slope), which a dispatch-per-iteration
slope would book as device time (~13% at round-3 kernel speed, and
growing as the kernel gets faster).

Robustness (round-3, after BENCH_r02 recorded a degraded-tunnel 1.14
img/s while the same code measured 16.6 on a re-run):
  * the reported slope is the CLUSTER (median of trials within 1.3x of
    the minimum), not the lucky minimum — per the round-2 finding that
    min-of-N can report transient minima the steady state never repeats;
  * the best-known cluster slope per (shape, strength, backend) persists
    in ~/.cache/pngloss_tpu/bench_calib.json; a capture >3x slower than
    best-known is treated as a degraded tunnel/chip state: cool down and
    re-measure (up to PNGLOSS_BENCH_RETRIES times), keep the best
    capture, and annotate the JSON with both numbers if it stays slow.

Why slopes at all: this box reaches its single v5e chip through an
experimental HTTP tunnel that (a) serializes host<->device transfers at
~20 MB/s and (b) does not honor block_until_ready, so any wall-clock of
dispatch+fetch measures the tunnel, not the chip. The slope isolates the
chip. The full streaming rate through dispatch_buckets/collect_bucket
(tunnel-transfer-bound on this box at ~6.3 MB per megapixel) is also
measured once and reported on stderr for transparency; on normally
attached hardware (PCIe host) the two converge.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CALIB_PATH = os.path.expanduser("~/.cache/pngloss_tpu/bench_calib.json")
DEGRADED_FACTOR = 3.0
CLUSTER_FACTOR = 1.3
COOLDOWN_S = 75.0      # a wedged chip clears in ~60s (working notes)


def _load_calib() -> dict:
    try:
        with open(CALIB_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_calib(calib: dict) -> None:
    try:
        os.makedirs(os.path.dirname(CALIB_PATH), exist_ok=True)
        tmp = CALIB_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(calib, f)
        os.replace(tmp, CALIB_PATH)
    except OSError:
        pass


def _cluster_slope(slopes: list[float]) -> float:
    """Median of the trials within CLUSTER_FACTOR of the minimum: the
    steady-state rate, robust to one lucky minimum AND to tail outliers.
    Non-positive slopes (a noisy t(1) exceeding t(4) — the tunnel's 3-4x
    run-to-run noise makes this reachable) are discarded first; if every
    trial was garbage, fall back to the largest observation so the caller
    reports a pessimistic-but-finite rate instead of crashing.

    The cluster must hold a MAJORITY of the surviving trials: a single
    lucky trial otherwise forms a singleton cluster and gets reported as
    the rate (observed in the round-5 pre-attack sweep: skel_noband read
    0.047 from one trial against an honest 4-trial cluster at 0.069, and
    shell 0.034 against 0.0494 — both contradicted the additivity of the
    other sub-term measurements). When the minimum's cluster is a
    minority, the minimum is the outlier: drop it and re-anchor."""
    pos = sorted(s for s in slopes if s > 0)
    if not pos:
        return max(max(slopes), 1e-9)
    while len(pos) > 1:
        cluster = [s for s in pos if s <= pos[0] * CLUSTER_FACTOR]
        if 2 * len(cluster) >= len(pos):
            return cluster[len(cluster) // 2]
        pos = pos[1:]
    return pos[0]


def _measure_slopes(run_k, trials: int, k: int = 4) -> list[float]:
    """run_k(k) dispatches ONE program doing k in-program iterations and
    blocks on its scalar; slope = (t(k) - t(1)) / (k - 1)."""
    slopes = []
    for _ in range(trials):
        t0 = time.time()
        run_k(1)
        t1 = time.time() - t0
        t0 = time.time()
        run_k(k)
        tk = time.time() - t0
        slopes.append((tk - t1) / (k - 1))
    return slopes


def make_bench_batch(suite_dir: str = "/root/reference/suite",
                     chunk_b: int = 25):
    """The canonical slope workload — lena (512x512 RGB, the reference's
    headline image) stacked chunk_b deep with an rng(0) byte-stripe
    perturbation so batch lanes aren't value-identical.  ONE definition
    shared with tools/prewarm.py and tools/ablate.py so every consumer
    builds the identical array.  Returns (batch, bpp, chunk_mp)."""
    from pngloss_tpu import codec
    from pngloss_tpu.pipeline import reduce_colorspace

    lena = open(os.path.join(suite_dir, "lena.png"), "rb").read()
    work, bpp = reduce_colorspace(codec.decode(lena).rgba)
    rng = np.random.default_rng(0)
    batch = np.stack([work] * chunk_b)
    batch[:, :, : 4 * bpp] = rng.integers(
        0, 256, (chunk_b, work.shape[0], 4 * bpp), np.uint8)
    chunk_mp = chunk_b * work.shape[0] * (work.shape[1] // bpp) / 1e6
    return batch, bpp, chunk_mp


def make_slope_prog(batch_dev, strength: int, bpp: int, *,
                    band_pad: int | None = None, wmax: int | None = None):
    """The jitted k-iteration slope program: the production optimizer run
    k times via lax.scan, inputs perturbed per step so XLA cannot CSE the
    iterations, outputs sum-reduced to one scalar.  ONE definition shared
    by bench.py, tools/prewarm.py and tools/ablate.py so their traces —
    and therefore their persistent-compile-cache keys — stay identical.
    Returns run_k(k) -> float."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pngloss_tpu.ops import optimize_batch_auto
    from pngloss_tpu.ops.optimize import band_pad_for
    from pngloss_tpu.ops.optimize_pallas import wmax_class_for

    if band_pad is None:
        band_pad = band_pad_for(strength)
    if wmax is None:
        wmax = wmax_class_for(strength)

    @functools.partial(jax.jit, static_argnames=("k",))
    def prog(rows, *, k: int):
        def step(acc, i):
            # perturb one byte stripe per iteration so XLA cannot fold
            # the k iterations into one
            r = rows.at[:, 0, 0].set(i)
            q, f = optimize_batch_auto(r, strength, 2, bpp=bpp,
                                       band_pad=band_pad, wmax=wmax)
            return (acc + jnp.sum(q.astype(jnp.int32))
                    + jnp.sum(f.astype(jnp.int32))), None
        acc, _ = lax.scan(step, jnp.int32(0),
                          jnp.arange(k, dtype=jnp.uint8))
        return acc

    def run_k(k):
        return float(prog(batch_dev, k=k))

    return run_k


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pngloss_tpu import codec
    from pngloss_tpu.pipeline import (
        collect_bucket,
        dispatch_buckets,
        reduce_colorspace,
    )

    strength = int(os.environ.get("PNGLOSS_BENCH_STRENGTH", "19"))

    # ---- device rate by dispatch slopes (one VMEM-quantum chunk) ----
    batch, bpp, chunk_mp = make_bench_batch()

    # input-resident: upload ONCE, outside every timed region
    batch_dev = jax.device_put(jnp.asarray(batch))
    run_k = make_slope_prog(batch_dev, strength, bpp)

    t0 = time.time()
    run_k(1)                 # compile + tunnel warmup
    run_k(4)
    compile_s = time.time() - t0

    trials = int(os.environ.get("PNGLOSS_BENCH_TRIALS", "7"))
    retries = int(os.environ.get("PNGLOSS_BENCH_RETRIES", "2"))

    calib = _load_calib()
    key = f"v2|{batch.shape}|s{strength}|{jax.default_backend()}"
    best_known = calib.get(key)

    slopes = _measure_slopes(run_k, trials)
    slope = _cluster_slope(slopes)
    first_slope = slope
    attempts = 1
    while (best_known is not None and slope > DEGRADED_FACTOR * best_known
           and attempts <= retries):
        print(f"# degradation guard: cluster {slope:.3f}s/chunk is "
              f">{DEGRADED_FACTOR}x best-known {best_known:.3f}s/chunk — "
              f"cooling down {COOLDOWN_S:.0f}s and re-measuring "
              f"(attempt {attempts}/{retries})", file=sys.stderr)
        time.sleep(COOLDOWN_S)
        retry = _measure_slopes(run_k, trials)
        retry_slope = _cluster_slope(retry)
        if retry_slope < slope:
            slopes, slope = retry, retry_slope
        attempts += 1
    degraded = (best_known is not None
                and slope > DEGRADED_FACTOR * best_known)

    if not degraded:
        calib[key] = min(slope, best_known) if best_known else slope
        _store_calib(calib)

    device_mp_s = chunk_mp / slope

    # ---- end-to-end stream rate through the production pipeline ----
    batch_n = int(os.environ.get("PNGLOSS_BENCH_BATCH", "100"))
    lena = open("/root/reference/suite/lena.png", "rb").read()
    work, _bpp = reduce_colorspace(codec.decode(lena).rgba)
    assert _bpp == bpp
    rng = np.random.default_rng(1)
    works, bpps = [], []
    for _ in range(batch_n):
        w = work.copy()
        w[:, : 4 * bpp] = rng.integers(
            0, 256, (w.shape[0], 4 * bpp), np.uint8)
        works.append(w)
        bpps.append(bpp)
    stream_mp = batch_n * work.shape[0] * (work.shape[1] // bpp) / 1e6
    t0 = time.time()
    for p in dispatch_buckets(works, bpps, strength):
        collect_bucket(p)
    stream_s = time.time() - t0
    stream_mp_s = stream_mp / stream_s

    # the stream rate is tunnel-state-bound on this box and can silently
    # degrade 2x between rounds (BENCH_r04 read 1.68 MP/s vs r3's 3.08 on
    # identical code) — apply the same best-known calibration the slope
    # gets, so the artifact self-describes a degraded capture instead of
    # looking like a regression
    stream_key = f"stream-v1|{batch_n}|s{strength}|{jax.default_backend()}"
    stream_best = calib.get(stream_key)
    # tighter factor than the slope guard: the stream is one ~15 s capture
    # (not a min-of-N), so honest run-to-run spread is small — r4's missed
    # degradation was only 1.83x
    stream_degraded = (stream_best is not None
                       and stream_mp_s * 1.5 < stream_best)
    if not stream_degraded:
        calib[stream_key] = max(stream_mp_s, stream_best or 0.0)
        _store_calib(calib)

    # baseline: 10k 1MP img/s across 8 chips -> 1250 MP/s/chip
    per_chip_target = 10000.0 / 8.0
    n_chips = max(1, len(jax.devices()))
    value = device_mp_s / n_chips
    record = {
        "metric": "1mp_images_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "img(1MP)/s/chip",
        "vs_baseline": round(value / per_chip_target, 4),
    }
    if degraded:
        # the capture never recovered: report it, but carry the evidence
        record["degraded_capture"] = True
        record["slope_s"] = round(slope, 4)
        record["best_known_slope_s"] = round(best_known, 4)
        record["best_known_value"] = round(
            chunk_mp / best_known / n_chips, 3)
    record["stream_mp_s"] = round(stream_mp_s, 2)
    if stream_degraded:
        record["stream_degraded_capture"] = True
        record["stream_best_known_mp_s"] = round(stream_best, 2)
    print(json.dumps(record))
    print(f"# device slope: cluster={slope:.3f}s/chunk "
          f"(min={min(slopes):.3f}, first-capture={first_slope:.3f}, "
          f"best-known={best_known if best_known is None else round(best_known, 3)}, "
          f"all: {[round(s, 3) for s in sorted(slopes)]}) "
          f"chunk={chunk_mp:.2f}MP compile+first={compile_s:.1f}s",
          file=sys.stderr)
    deg_note = (f" [DEGRADED tunnel state: best-known {stream_best:.2f}]"
                if stream_degraded else "")
    print(f"# stream (tunnel-transfer-bound on this box): "
          f"{stream_mp:.1f}MP in {stream_s:.2f}s = {stream_mp_s:.2f} MP/s; "
          f"devices={n_chips}{deg_note}", file=sys.stderr)


if __name__ == "__main__":
    main()
