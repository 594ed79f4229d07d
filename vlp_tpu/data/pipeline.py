"""Host->device input pipeline: batch assembly + double-buffered prefetch.

Replaces the reference's torch DataLoader worker pools (reference
KFoldCVDataModule.py:24 num_workers): the heavy per-sample MONAI work is
already gone (deterministic preprocessing is cached, augmentation runs
on-device — vlp_tpu.ops.augment), so the host side only gathers uint8 rows
out of a memory-mapped cache and stacks small metadata arrays. A background
thread assembles and device_puts the next batches while the device computes
(double buffering over the PCIe/ICI transfer).

Batches are always exactly ``batch_size`` (final ragged batch padded +
masked — XLA static shapes) and shardable along axis 0 of every array.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vlp_tpu.data.preprocess_host import ImageCache
from vlp_tpu.data.sampler import pad_batch_indices
from vlp_tpu.parallel.mesh import axis_size

DATASET_IDS = {"INTERNAL": 0, "BTXRD": 1, "MURA": 0, "LERA": 1}


class ArrayBundle:
    """Columnar host arrays for a split — built once from sample dicts."""

    def __init__(self, samples: Sequence[dict], cache: ImageCache,
                 cache_indices: Optional[Sequence[int]] = None,
                 token_ids: Optional[np.ndarray] = None,
                 token_mask: Optional[np.ndarray] = None) -> None:
        self.samples = list(samples)
        if not self.samples:
            raise ValueError(
                "empty sample list — the split has no samples (check the "
                "frozen-split files / subsampling options)")
        self.cache = cache
        n = len(self.samples)
        self.cache_indices = np.asarray(
            cache_indices if cache_indices is not None else np.arange(n),
            dtype=np.int64)
        assert len(self.cache_indices) == n
        first = self.samples[0] if n else {}
        self.is_pretrain = "caption_id" in first
        if self.is_pretrain:
            self.labels = np.array([s["label"] for s in self.samples], np.int32)
            self.caption_ids = np.array(
                [s["caption_id"] for s in self.samples], np.int32)
            assert token_ids is not None and token_mask is not None
            self.token_ids = token_ids
            self.token_mask = token_mask
        else:
            self.labels = np.array([s["tumor"] for s in self.samples], np.int32)
            self.clinical = np.stack(
                [np.asarray(s["clinical"], np.float32) for s in self.samples])
        unknown = {str(s["dataset"]) for s in self.samples} - set(DATASET_IDS)
        if unknown:
            raise ValueError(
                f"unknown dataset name(s) {sorted(unknown)}; CORAL domain "
                f"ids are derived from {sorted(DATASET_IDS)}")
        self.dataset_ids = np.array(
            [DATASET_IDS[str(s["dataset"])] for s in self.samples], np.int32)

    def __len__(self) -> int:
        return len(self.samples)

    def assemble_meta(self, indices: List[int], batch_size: int):
        """Everything except pixels, plus the cache rows to fetch — the
        device-resident path sends only this over the host->device link."""
        idx, mask = pad_batch_indices(list(indices), batch_size)
        idx = np.asarray(idx, np.int64)
        batch = {
            "label": self.labels[idx],
            "dataset_id": self.dataset_ids[idx],
            "mask": mask,
        }
        if self.is_pretrain:
            batch["input_ids"] = self.token_ids[idx]
            batch["attention_mask"] = self.token_mask[idx]
            batch["caption_id"] = self.caption_ids[idx]
        else:
            batch["clinical"] = self.clinical[idx]
        return batch, self.cache_indices[idx].astype(np.int32)

    def assemble(self, indices: List[int], batch_size: int) -> Dict[str, np.ndarray]:
        batch, cidx = self.assemble_meta(indices, batch_size)
        batch["image_u8"] = self.cache.gather(cidx)
        return batch

    def columns(self) -> Dict[str, np.ndarray]:
        """Per-sample metadata columns for the device-resident path: these
        upload ONCE; per batch only sample indices + the pad mask cross the
        host->device link and everything else gathers on device."""
        cols = {"label": self.labels, "dataset_id": self.dataset_ids,
                "cache_idx": self.cache_indices.astype(np.int32)}
        if self.is_pretrain:
            cols.update(input_ids=self.token_ids,
                        attention_mask=self.token_mask,
                        caption_id=self.caption_ids)
        else:
            cols["clinical"] = self.clinical
        return cols


_RESIDENT_LIMIT_MB = "VLP_DEVICE_RESIDENT_MB"  # per-device budget; 0 disables


class ResidentCorpus:
    """Device-resident uint8 image corpus with on-device batch gather.

    Modes (chosen by the per-device HBM budget, VLP_DEVICE_RESIDENT_MB):
    - ``local``: single device — plain device_put + jnp.take.
    - ``replicated``: multi-device mesh, corpus fits per chip — stored
      P() over the mesh; each device gathers its own batch shard locally
      (idx sharded P(axis) -> output sharded P(axis), zero collectives).
    - ``sharded``: corpus rows sharded P(axis) (1/data-axis-size per
      chip — a 2-D mesh's model axis replicates the rows);
      gather runs under shard_map: all_gather the wanted indices, each
      shard contributes the rows it owns, psum_scatter hands every device
      its output block. Pixels ride ICI once (~B x img bytes per batch).

    Either way only INDICES cross the host->device link per batch — on
    remote-PJRT tunnels the per-batch pixel transfer is otherwise the
    training bottleneck (measured ~10x), and even locally it frees PCIe.
    MURA+LERA at 224px is ~2 GB; the downstream set ~350 MB.
    """

    def __init__(self, cache: ImageCache, mesh, axis_name: str,
                 mode: str) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mode = mode
        self.mesh = mesh
        self.axis_name = axis_name
        data = np.asarray(cache.data)
        take = lambda imgs, idx: jnp.take(imgs, idx, axis=0, mode="clip")
        self._take1 = None  # standalone jit wrappers, built lazily
        self._takek = None
        if mode == "local":
            self.images = jax.device_put(data)
            self._take_fn1 = self._take_fnk = take
            return
        if mode == "replicated":
            self.images = jax.device_put(data, NamedSharding(mesh, P()))
            self._take_fn1 = self._take_fnk = take
            return
        assert mode == "sharded"
        n = axis_size(mesh, axis_name)  # rows shard over the DATA axis only
        total = len(data)
        padded = total + (-total) % n  # rows must divide over the mesh
        rest = data.shape[1:]

        def _shard(index):
            # per-shard slices straight off the (possibly memory-mapped)
            # cache: sharded mode exists precisely because the corpus is
            # too big per chip, so never np.concatenate/copy the whole
            # thing into host RAM just to pad the tail
            sl = index[0]
            start = sl.start or 0
            stop = padded if sl.stop is None else sl.stop
            if stop <= total:
                return data[start:stop]
            out = np.zeros((stop - start,) + rest, data.dtype)
            avail = max(0, total - start)
            if avail:
                out[:avail] = data[start:total]
            return out

        self.images = jax.make_array_from_callback(
            (padded,) + rest, NamedSharding(mesh, P(axis_name)), _shard)
        self._take_fn1 = self._sharded_gather([0])
        self._take_fnk = self._sharded_gather([None, 0])

    def _sharded_gather(self, idx_dims):
        """shard_map gather over row-sharded images. ``idx_dims``: which
        idx dim carries the batch shard (P(axis) or P(None, axis))."""
        from jax.sharding import PartitionSpec as P

        from vlp_tpu.ops.kernel_gate import shard_map_compat

        axis = self.axis_name
        n = axis_size(self.mesh, axis)  # data-axis shard count
        chunked = idx_dims == [None, 0]

        def body(imgs_local, idx_local):
            d = jax.lax.axis_index(axis)
            rows = imgs_local.shape[0]
            if chunked:  # [K, b_local] -> global [K, B_g] in device order
                k, bl = idx_local.shape
                idx_all = jax.lax.all_gather(idx_local, axis)  # [n, K, bl]
                idx_all = idx_all.transpose(1, 0, 2).reshape(k, n * bl)
            else:
                idx_all = jax.lax.all_gather(idx_local, axis, tiled=True)
            local = idx_all - d * rows
            inb = (local >= 0) & (local < rows)
            got = jnp.take(imgs_local, jnp.clip(local, 0, rows - 1), axis=0)
            # int16 accumulator: exactly one shard owns each row, the rest
            # contribute zeros, so the sum is exact; u8 psum support varies
            got = jnp.where(
                inb.reshape(inb.shape + (1,) * (got.ndim - inb.ndim)),
                got, 0).astype(jnp.int16)
            out = jax.lax.psum_scatter(
                got, axis, scatter_dimension=(1 if chunked else 0),
                tiled=True)
            return out.astype(jnp.uint8)

        spec = lambda dims: P(*(axis if d == 0 else None for d in dims))
        return shard_map_compat(body, self.mesh,
                                (P(axis), spec(idx_dims)), spec(idx_dims))

    def _put_idx(self, idx: np.ndarray):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.mode == "local":
            return jax.device_put(idx)
        spec = P(self.axis_name) if idx.ndim == 1 else P(None, self.axis_name)
        return jax.device_put(idx, NamedSharding(self.mesh, spec))

    def _standalone_jit(self, chunked: bool):
        """jit wrapper around the SAME ``take_callable`` body the loader's
        composed one-dispatch assemble traces (single source of truth for
        the gather semantics — a change to index dtype/sharding hits both
        paths). Standalone dispatch serves tests/dryrun and ad-hoc callers
        only, so the wrappers are built lazily, not in __init__."""
        fn = self.take_callable(chunked)
        if self.mode == "local":
            return jax.jit(fn)
        if self.mode == "replicated":
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(None, self.axis_name) if chunked else P(self.axis_name)
            return jax.jit(fn, out_shardings=NamedSharding(self.mesh, spec))
        return jax.jit(fn)

    def gather(self, idx: np.ndarray):
        """[B] indices -> [B, ...] batch-sharded pixels on device."""
        if self._take1 is None:
            self._take1 = self._standalone_jit(chunked=False)
        return self._take1(self.images, self._put_idx(idx))

    def gather_chunk(self, idx: np.ndarray):
        """[K, B] indices -> [K, B, ...] pixels sharded on dim 1."""
        if self._takek is None:
            self._takek = self._standalone_jit(chunked=True)
        return self._takek(self.images, self._put_idx(idx))

    def take_callable(self, chunked: bool):
        """The raw (unjitted) gather callable for composition INSIDE a
        larger jitted program (the loader's one-dispatch batch assemble)."""
        return self._take_fnk if chunked else self._take_fn1

    def image_spec(self):
        """PartitionSpec of the resident image array (None on one device)."""
        from jax.sharding import PartitionSpec as P

        if self.mode == "local":
            return None
        return P(self.axis_name) if self.mode == "sharded" else P()


def _resident_images(cache: ImageCache, mesh=None,
                     axis_name: str = "data") -> Optional[ResidentCorpus]:
    """Build (once per cache+mode, shared across loaders) the device-
    resident corpus, or None when it exceeds the budget even sharded."""
    limit_mb = float(os.environ.get(_RESIDENT_LIMIT_MB, "4096"))
    nbytes = cache.data.nbytes
    if mesh is None or mesh.size == 1:
        mode = "local" if nbytes <= limit_mb * 1e6 else None
    elif nbytes <= limit_mb * 1e6:
        mode = "replicated"
    # rows shard over the data axis only (a 2-D mesh's model axis holds
    # replicas), so per-device bytes divide by the data-axis size
    elif nbytes / axis_size(mesh, axis_name) <= limit_mb * 1e6:
        mode = "sharded"
    else:
        mode = None
    if mode is None:
        return None
    # Mesh is hashable; keying on the object (not id()) avoids returning a
    # corpus committed to a garbage-collected mesh whose address was reused
    # (in-process sweeps rebuild meshes).
    key = (mode, mesh)
    cached = getattr(cache, "_resident", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    corpus = ResidentCorpus(cache, mesh, axis_name, mode)
    cache._resident = (key, corpus)
    return corpus


class DeviceLoader:
    """Iterates device-resident batches with background prefetch."""

    def __init__(self, bundle: ArrayBundle, sampler, batch_size: int,
                 mesh=None, axis_name: str = "data",
                 prefetch_depth: int = 2) -> None:
        self.bundle = bundle
        self.sampler = sampler
        self.batch_size = batch_size
        self.mesh = mesh
        self.axis_name = axis_name
        self.prefetch_depth = max(1, prefetch_depth)
        # device-resident image corpus: local on one device, replicated or
        # row-sharded over a mesh (see ResidentCorpus) — only indices cross
        # the host->device link either way
        self._corpus = _resident_images(bundle.cache, mesh, axis_name)
        if self._corpus is not None:
            # metadata columns ride device-resident too: tokens/labels/
            # clinical are static per split, so the ONE jitted assemble
            # gathers pixels AND metadata from sample indices — the only
            # per-batch host->device transfer is idx + mask
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(mesh, P())
                self._cols_dev = {k: jax.device_put(v, repl)
                                  for k, v in bundle.columns().items()}
            else:
                self._cols_dev = {k: jax.device_put(v)
                                  for k, v in bundle.columns().items()}
            self._dev_single = None
            self._dev_chunk = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = axis_size(mesh, axis_name)
            if batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the "
                    f"{n_data}-shard data axis (every data shard gets an "
                    "equal slice; adjust data.batch_size/eval_batch_size or "
                    "mesh.data_parallel)")
            self._sharding = NamedSharding(mesh, P(axis_name))
        else:
            self._sharding = None

    def __len__(self) -> int:
        return len(self.sampler)

    def init_batch(self) -> Dict:
        """A shape-representative batch WITHOUT touching the sampler:
        model-init code must not advance the shared sampler RNG (the
        prefetch thread would otherwise race it a timing-dependent number
        of batches, breaking fixed-seed reproducibility)."""
        n = min(self.batch_size, len(self.bundle))
        return self._make_batch(list(range(n)))

    def _put(self, host_batch: Dict[str, np.ndarray]):
        if self._sharding is not None:
            return {k: jax.device_put(v, self._sharding)
                    for k, v in host_batch.items()}
        return {k: jax.device_put(v) for k, v in host_batch.items()}

    def _build_dev_assemble(self, chunked: bool):
        """ONE jitted program per batch/chunk: gather pixels + every
        metadata column on device from [.., B] sample indices. Inputs per
        call: idx + mask (tiny); columns and the corpus ride resident."""
        take = self._corpus.take_callable(chunked)

        def fn(cols, images, idx, mask):
            out = {k: jnp.take(v, idx, axis=0, mode="clip")
                   for k, v in cols.items() if k != "cache_idx"}
            cidx = jnp.take(cols["cache_idx"], idx, axis=0, mode="clip")
            out["image_u8"] = take(images, cidx)
            out["mask"] = mask
            return out

        if self.mesh is None or self._corpus.mode == "local":
            # single-device (a 1-device mesh keeps the local corpus mode)
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P

        bspec = P(None, self.axis_name) if chunked else P(self.axis_name)
        data = NamedSharding(self.mesh, bspec)
        repl = NamedSharding(self.mesh, P())
        img_sh = NamedSharding(self.mesh, self._corpus.image_spec())
        cols_sh = {k: repl for k in self._cols_dev}
        return jax.jit(fn, in_shardings=(cols_sh, img_sh, data, data),
                       out_shardings=data)

    def _make_batch(self, indices) -> Dict:
        """One device batch: resident path assembles fully on device."""
        if self._corpus is None:
            return self._put(self.bundle.assemble(indices, self.batch_size))
        idx, mask = pad_batch_indices(list(indices), self.batch_size)
        if self._dev_single is None:
            self._dev_single = self._build_dev_assemble(chunked=False)
        return self._dev_single(self._cols_dev, self._corpus.images,
                                np.asarray(idx, np.int32), mask)

    @staticmethod
    def _drain(q, stop, make_items):
        """Producer body: bounded puts that give up when the consumer is
        gone (generator dropped mid-epoch), so no thread is ever left
        blocked on q.put holding device buffers."""
        sentinel = object()

        def producer(err):
            try:
                for item in make_items():
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                # the sentinel MUST eventually land while the consumer
                # lives, or q.get() blocks forever — retry like the items
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        err: List[BaseException] = []
        t = threading.Thread(target=producer, args=(err,), daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def items():
            for indices in self.sampler:
                yield self._make_batch(indices)

        return self._drain(q, stop, items)

    def _put_chunk(self, host_batches: List[Dict[str, np.ndarray]]):
        """Stack k host batches to [K, B, ...] and transfer once, sharded
        P(None, axis) so the scanned step shards batch dim B."""
        return self._put_stacked({k: np.stack([b[k] for b in host_batches])
                                  for k in host_batches[0]})

    def _put_stacked(self, stacked: Dict[str, np.ndarray]):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, self.axis_name))
            return {k: jax.device_put(v, sh) for k, v in stacked.items()}
        return {k: jax.device_put(v) for k, v in stacked.items()}

    def _make_chunk(self, index_groups: List) -> Dict:
        """[K, B, ...] chunk; resident path assembles fully on device."""
        if self._corpus is None:
            return self._put_chunk([
                self.bundle.assemble(ix, self.batch_size)
                for ix in index_groups])
        pairs = [pad_batch_indices(list(ix), self.batch_size)
                 for ix in index_groups]
        idx = np.asarray([p[0] for p in pairs], np.int32)    # [K, B]
        mask = np.stack([p[1] for p in pairs])               # [K, B]
        if self._dev_chunk is None:
            self._dev_chunk = self._build_dev_assemble(chunked=True)
        return self._dev_chunk(self._cols_dev, self._corpus.images, idx,
                               mask)

    def iter_scan_chunks(self, k: int) -> Iterator:
        """Yield ('chunk', [K,B,...] pytree) for every full group of k
        batches and ('single', [B,...] batch) for the ragged tail — the
        scanned train step is compiled once for length k, tail batches reuse
        the per-step program. Prefetched like __iter__. On the resident path
        a queued chunk is only indices + async gather handles (cheap), so
        depth 2 keeps the device fed across the epoch-end Python gap
        (VERDICT r2 #3); on the host fallback path every queued chunk is K
        full device pixel batches — and the fallback fires exactly when the
        corpus was too big to be resident — so keep depth 1 there."""
        q: "queue.Queue" = queue.Queue(
            maxsize=2 if self._corpus is not None else 1)
        stop = threading.Event()

        def items():
            group: List = []
            for indices in self.sampler:
                group.append(indices)
                if len(group) == k:
                    yield ("chunk", self._make_chunk(group))
                    group = []
            for indices in group:  # ragged tail -> per-step batches
                yield ("single", self._make_batch(indices))

        return self._drain(q, stop, items)
