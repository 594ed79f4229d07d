"""Environment smoke test: imports, device visibility, 5-step dummy train.

Reference src/setup_test.py:3-60 verifies torch/lightning/wandb/hydra import
+ CUDA + a 5-step dummy training; here the equivalents are jax/flax/optax/
orbax imports, TPU (or CPU fallback) visibility, and a 5-step jitted train
loop on a tiny MLP.

Run: python -m vlp_tpu.setup_check
"""
from __future__ import annotations

import importlib


def check_package(name: str) -> bool:
    try:
        mod = importlib.import_module(name)
        print(f"OK   {name} {getattr(mod, '__version__', '')}")
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        return False


def test_training(steps: int = 5) -> bool:
    import jax
    import jax.numpy as jnp
    import optax

    print(f"devices: {jax.devices()} (default backend {jax.default_backend()})")

    def loss_fn(params, x, y):
        h = jnp.tanh(x @ params["w1"])
        pred = h @ params["w2"]
        return ((pred - y) ** 2).mean()

    key = jax.random.key(0)
    params = {"w1": jax.random.normal(key, (8, 16)) * 0.1,
              "w2": jax.random.normal(key, (16, 1)) * 0.1}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    x = jax.random.normal(key, (32, 8))
    y = jax.random.normal(key, (32, 1))

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = last = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        last = float(loss)
        first = first if first is not None else last
        print(f"step {i}: loss {last:.5f}")
    ok = last < first
    print("training", "OK (loss decreased)" if ok else "SUSPECT (loss did not decrease)")
    return ok


def main() -> int:
    ok = all([
        check_package("jax"),
        check_package("flax"),
        check_package("optax"),
        check_package("orbax.checkpoint"),
        check_package("numpy"),
        check_package("pandas"),
        check_package("sklearn"),
        check_package("vlp_tpu"),
    ])
    ok = test_training() and ok
    print("SETUP", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
