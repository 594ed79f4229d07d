"""jit/pjit step factories: train step (donated state), eval step, feature
extraction. Shardings: state replicated, batches sharded on the 'data' mesh
axis; GSPMD inserts the gradient psum / embedding all-gathers.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp_tpu.models.tasks import BaseTask
from vlp_tpu.ops.kernel_gate import set_kernel_mesh
from vlp_tpu.train.state import TrainState


def make_train_step(task: BaseTask, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, axis_name: str = "data",
                    state_shardings=None,
                    ) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """``state_shardings``: TrainState-shaped pytree of NamedShardings
    (mesh.fsdp_state_sharding) — params/moments sharded over the data axis
    ZeRO-style; GSPMD all-gathers at use and reduce-scatters the updates.
    None = fully replicated state (plain DP)."""
    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)
    def train_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(task.loss_fn, has_aux=True)
        (loss, (mutated, aux)), grads = grad_fn(
            state.params, state.extra_vars, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra_vars)
        extra.update(mutated)
        new_state = state.replace(step=state.step + 1, params=params,
                                  extra_vars=extra, opt_state=opt_state,
                                  rng=rng)
        return new_state, aux

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )


def make_scanned_train_step(task: BaseTask, tx: optax.GradientTransformation,
                            num_steps: int, mesh: Optional[Mesh] = None,
                            axis_name: str = "data",
                            state_shardings=None,
                            aux_keys: Tuple[str, ...] = ()) -> Callable:
    """K training steps inside ONE jitted call via ``lax.scan`` over batches
    stacked on a leading axis (pytree of [K, ...] arrays).

    Motivation: each host->device dispatch costs a round trip (severe over
    remote PJRT tunnels, nonzero everywhere); scanning the loop on device
    makes throughput dispatch-free. Returns (new_state, losses[K]).

    ``aux_keys``: extra per-step loss aux entries to stack out of the scan
    (e.g. ("img_emb", "txt_emb") — VLP train-epoch retrieval caching rides
    the scan instead of forcing per-step dispatch; they stay on device,
    batch-sharded under a mesh).
    """
    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)

    def one_step(state: TrainState, batch: Dict):
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(task.loss_fn, has_aux=True)
        (loss, (mutated, _aux)), grads = grad_fn(
            state.params, state.extra_vars, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = dict(state.extra_vars)
        extra.update(mutated)
        images = jnp.sum(batch["mask"])  # pipeline batches always carry mask
        out = {"loss": loss, "images": images}
        out.update({k: _aux[k] for k in aux_keys})
        return state.replace(step=state.step + 1, params=params,
                             extra_vars=extra, opt_state=opt_state,
                             rng=rng), out

    def multi_step(state: TrainState, batches: Dict):
        return jax.lax.scan(one_step, state, batches, length=num_steps)

    if mesh is None:
        return jax.jit(multi_step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, axis_name))  # [K, B, ...] shard B
    state_sh = state_shardings if state_shardings is not None else repl
    # stacked aux embeddings stay batch-sharded; scalars replicate
    aux_sh = {"loss": repl, "images": repl,
              **{k: data for k in aux_keys}}
    return jax.jit(multi_step, in_shardings=(state_sh, data),
                   out_shardings=(state_sh, aux_sh), donate_argnums=(0,))


def make_eval_step(task: BaseTask, mesh: Optional[Mesh] = None,
                   axis_name: str = "data") -> Callable:
    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)
    def eval_step(variables: Dict, batch: Dict) -> Dict:
        return task.eval_fn(variables, batch)

    if mesh is None:
        return jax.jit(eval_step)
    data = NamedSharding(mesh, P(axis_name))
    # variables inherit their own placement (replicated OR fsdp-sharded —
    # pinning P() here rejects fsdp state at call time)
    return jax.jit(eval_step, in_shardings=(None, data), out_shardings=None)


def make_apply_fn(fn: Callable, mesh: Optional[Mesh] = None,
                  axis_name: str = "data") -> Callable:
    """Generic jitted (variables, batch) -> output with batch sharding
    (feature extraction, embedding passes)."""
    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)
    if mesh is None:
        return jax.jit(fn)
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(fn, in_shardings=(None, data), out_shardings=None)


def make_scanned_apply_fn(fn, num_steps: int, mesh: Optional[Mesh] = None,
                          axis_name: str = "data") -> Callable:
    """(variables, batches [K, ...]) -> stacked fn outputs [K, ...] via ONE
    ``lax.scan`` dispatch — collapses per-batch eval / feature-extraction
    host round trips the same way the scanned train step does. Used for
    VLP validation embeddings and linear-probe feature extraction."""
    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)

    def multi(variables: Dict, batches: Dict):
        def body(c, b):
            return c, fn(variables, b)

        _, outs = jax.lax.scan(body, 0, batches, length=num_steps)
        return outs

    if mesh is None:
        return jax.jit(multi)
    data = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(multi, in_shardings=(None, data), out_shardings=None)


def make_scanned_metric_eval_step(task: BaseTask, num_steps: int,
                                  mesh: Optional[Mesh] = None,
                                  axis_name: str = "data") -> Callable:
    """Classifier validation: K eval batches per dispatch with the
    streaming metric state riding the scan carry — nothing leaves the
    device per batch; the caller fetches the state once per loader."""
    from vlp_tpu.ops import metrics as M

    if mesh is not None:
        set_kernel_mesh(mesh, axis_name)

    def multi(variables: Dict, st, batches: Dict):
        def body(st, b):
            o = task.eval_fn(variables, b)
            return M.update_state(st, o["logits"], o["labels"], o["mask"],
                                  o["loss"]), ()

        st, _ = jax.lax.scan(body, st, batches, length=num_steps)
        return st

    if mesh is None:
        return jax.jit(multi)
    data = NamedSharding(mesh, P(None, axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(multi, in_shardings=(None, repl, data),
                   out_shardings=repl)


_COLLECT_CACHE: "OrderedDict" = None  # built lazily below
_COLLECT_CACHE_MAX = 16  # a fold holds ~2-3 entries; sweeps/folds churn


def _cached_apply_fns(fn, scan_steps, mesh, axis_name):
    """Memoized (single, scan) jit wrappers per underlying function —
    rebuilding them per call would re-trace NesT/ViT-sized programs every
    probe epoch. Bound methods hash by (instance, function) so repeated
    attribute access maps to one entry. LRU-bounded so long in-process
    sweeps don't retain every trial's task + compiled programs forever."""
    from collections import OrderedDict

    global _COLLECT_CACHE
    if _COLLECT_CACHE is None:
        _COLLECT_CACHE = OrderedDict()
    from vlp_tpu.ops.kernel_gate import kernel_dispatch_key
    key = (getattr(fn, "__self__", None), getattr(fn, "__func__", fn),
           scan_steps, mesh, axis_name, kernel_dispatch_key())
    if key in _COLLECT_CACHE:
        _COLLECT_CACHE.move_to_end(key)
    else:
        single = make_apply_fn(fn, mesh, axis_name)
        scan = make_scanned_apply_fn(fn, scan_steps, mesh, axis_name) \
            if scan_steps > 1 else None
        _COLLECT_CACHE[key] = (single, scan)
        while len(_COLLECT_CACHE) > _COLLECT_CACHE_MAX:
            _COLLECT_CACHE.popitem(last=False)
    return _COLLECT_CACHE[key]


def collect_over_loader(fn, variables: Dict, loader, scan_steps: int = 8,
                        mesh: Optional[Mesh] = None,
                        axis_name: str = "data"):
    """Masked (out, labels) over a whole loader with K-batch scan
    dispatches: O(batches/scan_steps) host round trips instead of
    O(batches). Padding rows (mask 0) are dropped."""
    import numpy as np

    single, scan = _cached_apply_fns(fn, scan_steps, mesh, axis_name)
    outs, labels = [], []

    def eat(o, mask, label, chunked):
        m = np.asarray(jax.device_get(mask)).reshape(-1) > 0
        f = np.asarray(jax.device_get(o))
        if chunked:  # [K, B, ...] -> [K*B, ...] (row order matches mask)
            f = f.reshape((-1,) + f.shape[2:])
        outs.append(f[m])
        labels.append(np.asarray(jax.device_get(label)).reshape(-1)[m])

    if scan_steps > 1:
        for kind, payload in loader.iter_scan_chunks(scan_steps):
            if kind == "chunk":
                eat(scan(variables, payload), payload["mask"],
                    payload["label"], True)
            else:
                eat(single(variables, payload), payload["mask"],
                    payload["label"], False)
    else:
        for batch in loader:
            eat(single(variables, batch), batch["mask"], batch["label"],
                False)
    return np.concatenate(outs), np.concatenate(labels)
