"""Host input pipeline: batching, shuffling, device prefetch.

Replaces the reference's DataLoader workers + CUDA-stream PrefetchLoader
(src/datasets/dataloader.py:85-160) with a deterministic seeded sampler
and a double-buffered ``device_put`` prefetcher (SURVEY.md §7.4 item 5:
this is where QA-pairs/sec is won on TPU — the device should never wait
on the host).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from sasvqa_tpu.core.logging import LOGGER

# NOTE: sasvqa_tpu.parallel.mesh (-> jax) is imported lazily inside
# DevicePrefetcher._stage so spawn-started pool workers, which re-import
# this module to find _pool_collate, never pay the jax import.


def batch_indices(n: int, batch_size: int, shuffle: bool,
                  rng: Optional[np.random.Generator],
                  drop_last: bool = False,
                  order: Optional[np.ndarray] = None) -> List[np.ndarray]:
    """Chunk a sample ordering into batches.  ``order`` overrides the
    default arange/permutation (used by epoch_batches after per-host
    sharding)."""
    if order is None:
        order = np.arange(n)
        if shuffle:
            assert rng is not None
            order = rng.permutation(n)
    batches = [order[i:i + batch_size] for i in range(0, len(order),
                                                      batch_size)]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()
    return batches


def shard_for_host(indices: np.ndarray,
                   process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> np.ndarray:
    """Per-host slice of a sample ordering (multi-host input sharding;
    replaces the reference's DistributedSampler usage, SURVEY.md §5.8).

    Deterministic stride split, padded to EQUAL per-host length by
    wrapping from the front of the ordering (torch DistributedSampler
    semantics).  Equal lengths are a correctness requirement, not a
    convenience: hosts consume one batch per global step in lockstep,
    so unequal shards under drop_last would roll hosts into different
    epoch permutations and silently break disjointness.
    Defaults read jax.process_index()/process_count().
    """
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(indices)
    total = -(-n // pc) * pc            # ceil to a multiple of pc
    if total > n and n > 0:
        # np.resize TILES the ordering until it fills, so padding stays
        # correct even when process_count exceeds the dataset size
        # (torch DistributedSampler tiles the same way); a single
        # front-slice concat would come up short there (ADVICE r2)
        indices = np.resize(indices, total)
    return indices[pi::pc]


def eval_batch_plan(n: int, global_bs: int):
    """Global eval batch plan, IDENTICAL on every process.

    Yields (idx_padded, n_real_groups): sequential batches over ``n``
    samples, each index list tiled (np.resize) to EXACTLY ``global_bs``
    rows.  Constant shapes mean the eval step compiles once; tiled
    padding rows sit at the END so consumers drop them by slicing the
    first n_real outputs.  Each process evaluates the rows of every
    batch that its devices address (``host_batch_positions`` — the
    contiguous block ``[pi*global_bs/pc, ...)`` on data-axis-aligned
    meshes, replica rows when hosts straddle a non-data axis)."""
    assert global_bs >= 1
    for start in range(0, n, global_bs):
        idx = np.arange(start, min(start + global_bs, n))
        yield np.resize(idx, global_bs), len(idx)


def collate_indices(dataset, collator, idx, rng) -> Dict[str, Any]:
    items = [dataset.get_group(int(i)) for i in idx]
    return collator(items, rng=rng)


# -- worker-pool collation (the reference's DataLoader n_workers=4
#    equivalent, run_video_qa.py:184) ----------------------------------
#
# each task carries its batch indices + a seed so collation randomness
# (frame-sampling policies) is deterministic regardless of which worker
# runs it or in what order tasks complete (results are consumed in
# submission order via imap).

_WORKER_STATE: Dict[str, Any] = {}


def _pool_init(dataset, collator):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["collator"] = collator


def _pool_collate(task):
    idx, seed = task
    rng = np.random.default_rng(seed)
    return collate_indices(_WORKER_STATE["dataset"],
                           _WORKER_STATE["collator"], idx, rng)


class CollatorPool:
    """Process pool running get_group + collate off the main process.

    Workers are **spawn**-started by default: the training process is
    heavily multithreaded by the time the pool exists (XLA dispatch,
    prefetch threads), and POSIX fork of a multithreaded parent can
    deadlock a child on an inherited lock — observed as a wedged
    full-suite test run.  Spawn children start clean; they pickle
    (dataset, collator) once at pool start (FrameStoreReader drops its
    HDF5 handle in __getstate__ and reopens lazily) and never import
    jax (the worker module's jax dependency is imported lazily).

    ``start_method="fork"`` remains available for setups whose dataset
    or collator cannot be pickled; it inherits the parent's memory for
    free but carries the fork-after-threads caveat above.
    """

    def __init__(self, dataset, collator, n_workers: int,
                 start_method: str = "spawn"):
        import multiprocessing as mp
        assert n_workers > 0
        ctx = mp.get_context(start_method)
        self.n_workers = n_workers
        self._pool = ctx.Pool(n_workers, initializer=_pool_init,
                              initargs=(dataset, collator))

    def imap(self, tasks, window: Optional[int] = None):
        """tasks: iterable of (indices, seed) -> ordered batch iterator.

        Bounded submission: at most ``window`` tasks are in flight /
        buffered (Pool.imap would enqueue the whole epoch and buffer
        every finished ~100s-of-MB batch unboundedly when the consumer
        is slower than the workers).
        """
        from collections import deque
        if window is None:
            window = 2 * self.n_workers
        pending = deque()
        for t in tasks:
            pending.append(self._pool.apply_async(_pool_collate, (t,)))
            if len(pending) >= window:
                yield pending.popleft().get()
        while pending:
            yield pending.popleft().get()

    def close(self):
        self._pool.terminate()
        self._pool.join()


def epoch_batches(dataset, collator, batch_size: int, shuffle: bool,
                  rng: Optional[np.random.Generator] = None,
                  drop_last: bool = False,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None,
                  pool: Optional[CollatorPool] = None,
                  host_positions: Optional[np.ndarray] = None,
                  global_batch: Optional[int] = None,
                  ) -> Iterator[Dict[str, Any]]:
    """One epoch of collated host batches.

    Multi-host, general form (``host_positions`` + ``global_batch``):
    every host computes the same epoch permutation (same seeded rng)
    and walks it in GLOBAL batches of ``global_batch`` samples; each
    host collates the rows of every global batch that its devices
    address (``parallel.mesh.host_batch_positions``).  Hosts aligned
    with the data axis get disjoint contiguous blocks; hosts that
    straddle a non-data mesh axis are replicas and collate identical
    rows with an identical rng — bitwise-equal local shards, as
    ``jax.make_array_from_process_local_data`` requires.  This replaces
    the reference's DistributedSampler pattern
    (run_video_retrieval.py:109-111).

    Legacy multi-host form (``process_index``/``process_count`` only):
    the per-host disjoint stride split of the permutation — equivalent
    to the general form for data-axis-aligned hosts up to within-batch
    order, kept for callers without a mesh.

    rng discipline: exactly TWO draws are consumed from ``rng`` per
    epoch (a permutation seed and a collation seed), regardless of
    shard size, batch count, or sampling policy — so hosts stay
    permutation-synchronized across epochs.  Each batch collates with
    its own derived generator (seeded by batch index — and, in the
    legacy form, process index), making the serial and pooled paths
    bitwise identical.
    """
    pc = process_count
    if pc is None:
        import jax
        pc = jax.process_count()
    pi = process_index
    if pi is None and pc > 1:
        import jax
        pi = jax.process_index()
    pi = pi or 0

    if shuffle:
        assert rng is not None
        perm_seed = int(rng.integers(0, 2 ** 63))
        order = np.random.default_rng(perm_seed).permutation(len(dataset))
    else:
        order = np.arange(len(dataset))
    collate_seed = (int(rng.integers(0, 2 ** 63))
                    if rng is not None else 0)
    if host_positions is not None:
        # general multi-host path: walk the permutation in global
        # batches; this host loads its addressable rows of each
        gb = int(global_batch)
        n_steps = (len(order) // gb if drop_last
                   else -(-len(order) // gb))
        if n_steps == 0:
            raise ValueError(
                f"{len(order)} samples yield zero drop_last global "
                f"batches of {gb} — training would spin forever; "
                "shrink the batch")
        if n_steps * gb > len(order):
            order = np.resize(order, n_steps * gb)
        pos = np.asarray(host_positions)
        batches = [order[t * gb + pos] for t in range(n_steps)]
        # seed by the host's row BLOCK (first global row), not the
        # process index: replica hosts (identical positions) must
        # collate bitwise-identically, while disjoint-block hosts need
        # INDEPENDENT collator draws (e.g. 'random'-policy frame
        # gumbel noise) — host_batch_positions guarantees row sets are
        # identical or disjoint, so pos[0] fingerprints the block
        seeds = [(collate_seed, b, int(pos[0]))
                 for b in range(len(batches))]
    else:
        if pc > 1:
            order = shard_for_host(order, pi, pc)
        if drop_last and len(order) < batch_size:
            raise ValueError(
                f"per-host shard of {len(order)} samples yields zero "
                f"drop_last batches of size {batch_size} — training "
                "would spin forever; shrink the batch or the host count")
        batches = batch_indices(len(order), batch_size, False, None,
                                drop_last=drop_last, order=order)
        seeds = [(collate_seed, pi, b) for b in range(len(batches))]
    if pool is None:
        for idx, seed in zip(batches, seeds):
            yield collate_indices(dataset, collator, idx,
                                  np.random.default_rng(seed))
    else:
        yield from pool.imap(zip(batches, seeds))


def infinite_batches(dataset, collator, batch_size: int,
                     rng: np.random.Generator,
                     drop_last: bool = True,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None,
                     pool: Optional[CollatorPool] = None,
                     host_positions: Optional[np.ndarray] = None,
                     global_batch: Optional[int] = None,
                     ) -> Iterator[Dict[str, Any]]:
    """InfiniteIterator equivalent (dataloader.py:147-160): reshuffles
    each epoch, never raises StopIteration."""
    while True:
        yield from epoch_batches(dataset, collator, batch_size,
                                 shuffle=True, rng=rng, drop_last=drop_last,
                                 process_index=process_index,
                                 process_count=process_count, pool=pool,
                                 host_positions=host_positions,
                                 global_batch=global_batch)


def stack_microbatches(it: Iterator[Dict[str, Any]], k: int,
                       host_keys=None) -> Iterator[Dict[str, Any]]:
    """Group K consecutive host batches into ONE stacked batch with a
    leading micro axis — array leaves become (K, B, ...) — feeding the
    lax.scan accumulation train step (train/steps.make_scan_train_step).

    Collators pad text to fixed buckets and training batching uses
    drop_last, so all K micros share identical leaf shapes (asserted).
    Host-side keys (question_ids, ...) become lists of per-micro values;
    a leaf that is None must be None in every micro.
    """
    assert k >= 1
    if host_keys is None:
        host_keys = DevicePrefetcher.HOST_KEYS
    it = iter(it)
    while True:
        group = []
        for _ in range(k):
            try:
                group.append(next(it))
            except StopIteration:
                # incomplete trailing group = a partial accumulation
                # window; drop it (same semantics as a MultiSteps run
                # ending mid-cycle: those micros never emit an update)
                return
        out: Dict[str, Any] = {}
        for key in group[0]:
            vals = [g[key] for g in group]
            if key in host_keys:
                out[key] = vals
            elif vals[0] is None:
                assert all(v is None for v in vals), key
                out[key] = None
            else:
                shapes = {np.asarray(v).shape for v in vals}
                assert len(shapes) == 1, (
                    f"micro-batch leaf '{key}' shapes differ across the "
                    f"accumulation window: {shapes} — stacking requires "
                    f"fixed collator buckets + drop_last batching")
                out[key] = np.stack(vals)
        yield out


class MetaLoader:
    """Ratio-weighted multi-task batch interleaver
    (reference: src/datasets/dataloader.py:14-55 — used by its pretrain
    path).  Yields (task_name, batch) drawn from per-task infinite
    iterators with probability proportional to the given ratios,
    deterministically from a seeded Generator.
    """

    def __init__(self, loaders, rng: np.random.Generator):
        """loaders: {name: iterator} or {name: (iterator, ratio)}."""
        assert loaders, "MetaLoader needs at least one loader"
        self.names: List[str] = []
        self.iters: List[Any] = []
        ratios: List[float] = []
        for name, l in loaders.items():
            if isinstance(l, tuple):
                it, r = l
            else:
                it, r = l, 1
            self.names.append(name)
            self.iters.append(it)
            ratios.append(float(r))
        p = np.asarray(ratios, np.float64)
        self._p = p / p.sum()
        self._rng = rng

    def __iter__(self):
        return self

    def __next__(self):
        task = int(self._rng.choice(len(self.iters), p=self._p))
        return self.names[task], next(self.iters[task])


_SENTINEL = object()


class DevicePrefetcher:
    """Background thread that stages the next host batch onto devices
    while the current step computes (the TPU analogue of the reference's
    CUDA-stream PrefetchLoader, dataloader.py:85-144).

    ``host_keys`` stay on host (question_ids etc.); array leaves are
    device_put with the mesh's data-axis sharding when a mesh is given.
    """

    HOST_KEYS = ("question_ids", "n_examples_list")

    def __init__(self, it: Iterator[Dict[str, Any]], mesh=None, depth: int = 2,
                 micro_axis: bool = False):
        """``micro_axis``: batches are K-stacked (K, B, ...) from
        stack_microbatches — shard dim 1 on 'data', not dim 0."""
        self._mesh = mesh
        self._micro_axis = micro_axis
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._src = it
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _stage(self, batch: Dict[str, Any]):
        host = {k: batch.pop(k) for k in list(batch.keys())
                if k in self.HOST_KEYS}
        arrays = {k: v for k, v in batch.items() if v is not None}
        if self._mesh is not None:
            from sasvqa_tpu.parallel.mesh import shard_batch
            arrays = shard_batch(arrays, self._mesh,
                                 micro_axis=self._micro_axis)
        else:
            import jax
            arrays = {k: jax.device_put(v) for k, v in arrays.items()}
        arrays.update({k: None for k, v in batch.items() if v is None})
        return arrays, host

    def _work(self):
        try:
            for batch in self._src:
                staged = self._stage(batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # surface in consumer thread
            self._err = e
        finally:
            # the sentinel MUST land: dropping it on queue.Full (both
            # slots holding staged batches) would leave the consumer
            # blocked in _q.get() forever and swallow self._err.  Block
            # with the same stop-aware retry as the normal put path.
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Stop the producer and release the staged device batches.

        Consumers that break out of the iteration early (fixed-step
        training loops) must call this, otherwise up to ``depth`` fully
        staged batches stay pinned in device memory.

        Order matters: JOIN the producer first, THEN drain.  Draining
        first opens a race — a producer blocked in ``put`` wakes on the
        freed slot and re-inserts a fully staged batch *after* the
        drain, leaving it pinned for the rest of the run (found by r3
        review).  With ``_stop`` set and no consumer, the blocked put
        can only time out and exit via the stop check, so the join
        completes and the drain then observes the final queue state."""
        self._stop.set()
        self._thread.join(timeout=5)
        if self._thread.is_alive():
            # a producer wedged in _stage (e.g. blocking device_put)
            # makes the drain-then-reinsert race reachable again — make
            # the leak visible and re-drain after a second join
            LOGGER.warning("DevicePrefetcher producer thread did not "
                           "exit within 5s; staged batches may stay "
                           "pinned in device memory")
            self._drain()
            self._thread.join(timeout=5)
        self._drain()

    def _drain(self):
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
