"""Chip-health calibration: dependent bf16 8192^3 matmul chain.

The known-FLOPs workload used to classify measurement windows (healthy
~164 TFLOP/s on this v5e, degraded windows have measured ~111-120; see
BASELINE.md measurement protocol). Two hazards this routine is built
around (both bit this repo before):

* the remote runtime CACHES results of identical-input executions — and
  an all-ones input is a FIXED POINT of ``x @ x / 8192`` (ones@ones =
  8192 exactly, /8192 = ones), so the round-2/3 scripts' "distinct
  input" second call actually repeated the warm call's input VALUES.
  Here the input carries an iota-based perturbation and a per-call salt,
  so no two calls (or chain steps) ever see the same values;
* a device->host value fetch is the only true barrier, but it costs a
  full tunnel round trip (~50-80 ms) which a single timed chain absorbs
  into its estimate. Here the rate comes from the DIFFERENCE of two
  chain lengths, which cancels the fetch plus any constant dispatch
  overhead.
"""

from __future__ import annotations

import time

N = 8192
FLOPS_PER_MM = 2 * N**3


def calibrate_tflops(lengths=(2, 7, 12), repeats: int = 2,
                     salt: float = 0.0, n: int = N) -> float:
    """Measured dependent-matmul rate in TFLOP/s.

    Median of pairwise slopes of wall time vs chain length across
    ``repeats`` sweeps: the intercept (fetch round trip + dispatch) is
    discarded and per-fetch jitter (measured 5-80 ms on this tunnel)
    lands in individual samples, not the median slope.
    """
    import jax
    import jax.numpy as jnp

    flops_per_mm = 2 * n**3

    def make_chain(k: int):
        @jax.jit
        def chain(x):
            for _ in range(k):
                # Normalized so values stay O(1) but never constant:
                # each step's input differs from every other step's.
                x = x @ x / n + 1e-3
            return x
        return chain

    @jax.jit
    def seed(s):
        # Row/column iota perturbation around 1.0: well-conditioned,
        # value-distinct per (i, j) and per salt.
        i = jnp.arange(n, dtype=jnp.float32)
        x = (1.0 + 1e-4 * i[:, None] / n + 7e-5 * i[None, :] / n + s)
        return x.astype(jnp.bfloat16)

    chains = {k: make_chain(k) for k in lengths}
    s = salt
    for k in lengths:                       # compile outside the timing
        s += 1e-4
        float(chains[k](seed(jnp.float32(s)))[0, 0])

    samples = []                            # (k, wall)
    for _ in range(repeats):
        for k in lengths:
            s += 1e-4
            x = seed(jnp.float32(s))
            t0 = time.perf_counter()
            y = chains[k](x)
            float(y[0, 0])                  # true barrier (value fetch)
            samples.append((k, time.perf_counter() - t0))

    slopes = sorted((tj - ti) / (kj - ki)
                    for i, (ki, ti) in enumerate(samples)
                    for kj, tj in samples[i + 1:] if kj != ki)
    per_mm = max(slopes[len(slopes) // 2], 1e-9)
    return flops_per_mm / per_mm / 1e12


def main() -> None:
    print(f"calibration: {calibrate_tflops():.1f} TFLOP/s")


if __name__ == "__main__":
    main()
