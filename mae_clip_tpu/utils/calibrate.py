"""Chip-health calibration: dependent bf16 8192^3 matmul chain.

The known-FLOPs workload used to classify measurement windows. With the
fetch-cancelled median-of-slopes protocol below, this v5e sustains
~186 TFLOP/s (~94% of the 197 bf16 peak) in HEALTHY windows, repeatably
(round-3 measurement, BASELINE.md "Calibration methodology CORRECTION").
Readings of 110-120 under the OLD single-chain protocol were tunnel
fetch latency, not the chip; under THIS protocol a low reading means the
window really is degraded. Two hazards this routine is built around
(both bit this repo before):

* the remote runtime CACHES results of identical-input executions
  (observed keyed on buffer identity, but don't rely on that alone) —
  and an all-ones input is a FIXED POINT of ``x @ x / 8192``, so the
  round-2/3 scripts' "distinct input" second call actually repeated the
  warm call's input VALUES. Here every timed CALL gets a seed whose
  iota span and per-call salt increment are large relative to bf16
  resolution at the seed scale (bf16 eps at 0.9 is ~3.5e-3; the span is
  8e-2 and the salt step 1e-2), checked by an explicit non-constant
  assert after the bf16 cast. Value repetition BETWEEN steps inside one
  chain is harmless — the k matmuls live in a single compiled program,
  which has no result cache to hit — so only call-level distinctness is
  enforced. The mean sits below 1.0 on purpose: the squaring map
  ``m -> m^2 + c`` diverges to inf within ~11 steps from any mean > 1,
  and decays benignly toward its small fixed point (~c) from below;
* a device->host value fetch is the only true barrier, but it costs a
  full tunnel round trip (~5-80 ms) which a single timed chain absorbs
  into its estimate. Here the rate comes from the DIFFERENCE of two
  chain lengths, which cancels the fetch plus any constant dispatch
  overhead.
"""

from __future__ import annotations

import time

N = 8192
FLOPS_PER_MM = 2 * N**3

# Chain offset: exactly representable in bf16 and >= bf16 eps at every
# value scale the chain visits (values decay from ~0.9 toward the map's
# small fixed point near this constant).
_CHAIN_OFFSET = 1.0 / 64.0


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
                # Stays O(1)-ish: mean < 1 decays toward ~_CHAIN_OFFSET.
                x = x @ x / n + _CHAIN_OFFSET
            return x
        return chain

    @jax.jit
    def seed(s):
        # Base 0.9 with iota spans of 5e-2/3e-2 across the full axis:
        # ~20+ distinct bf16 values per axis (eps at 0.9 ~ 3.5e-3),
        # well-conditioned, and value-distinct per 1e-2 salt step.
        i = jnp.arange(n, dtype=jnp.float32)
        x = (0.9 + 5e-2 * i[:, None] / n + 3e-2 * i[None, :] / n + s)
        return x.astype(jnp.bfloat16)

    def fresh_seed():
        nonlocal s
        s += 1e-2
        x = seed(jnp.float32(s))
        # Guard the whole anti-caching design: a constant seed would be
        # one runtime change away from measuring a cached result.
        if not float(x.max() - x.min()) > 0:
            raise AssertionError(
                "calibration seed collapsed to a constant after the "
                "bf16 cast — perturbations below bf16 resolution")
        return x

    chains = {k: make_chain(k) for k in lengths}
    s = salt
    for k in lengths:                       # compile outside the timing
        float(chains[k](fresh_seed())[0, 0])

    samples = []                            # (k, wall)
    for _ in range(repeats):
        for k in lengths:
            x = fresh_seed()
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
