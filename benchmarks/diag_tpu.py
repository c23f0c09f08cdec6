"""Phased TPU diagnostic: times init/compile/run of the HCM forward at each
configuration axis (dtype, pallas on/off, loop on/off) with progress prints.
Run manually when measurements look off: python benchmarks/diag_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        print(f"[{name}] {time.time() - t0:.1f}s", flush=True)
        return out

    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16") else jnp.float32
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"pallas_disabled={bool(os.environ.get('ROBO_VLN_DISABLE_PALLAS'))}",
          flush=True)

    setup = phase(
        "setup+jitted-init",
        lambda: g._hcm_setup(224, 256, 200, 2, 16, compute_dtype=dtype),
    )
    (cfg, high, low, hparams, lparams, obs, masks, prev, hh, lh) = setup

    @jax.jit
    def fwd(obs, hh, lh):
        logits, hh = high.apply(hparams, obs, hh, prev, masks)
        pred = jnp.argmax(logits, axis=-1)
        actions, stop, lh = low.apply(lparams, obs, lh, prev, masks, pred)
        return jnp.mean(actions.astype(jnp.float32))

    phase("fwd lower", lambda: fwd.lower(obs, hh, lh))
    lowered = fwd.lower(obs, hh, lh)
    compiled = phase("fwd compile", lowered.compile)
    phase("fwd run1", lambda: float(compiled(obs, hh, lh)))
    for i in range(3):
        phase(f"fwd run{i + 2}", lambda: float(compiled(obs, hh, lh)))


if __name__ == "__main__":
    main()
