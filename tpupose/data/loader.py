"""Host batching + device prefetch.

Replaces torch DataLoader workers + pin_memory + prefetch_factor
(reference: HPE/train.py:72-79). On TPU the winning pattern is: cheap host
collation of uint8 batches, a background thread, and an N-deep device
prefetch queue so host IO overlaps the compiled step (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import collections

import numpy as np


class BatchLoader:
    """Minimal epoch-based batch iterator over a map-style dataset.

    Collation stacks each dict field — all samples are already static-shape
    (padded), so collation is a cheap np.stack, not ragged concat.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_workers: int = 0,
                 pad_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        # pad_last: repeat the last sample to fill the tail batch and mark
        # real rows in a `pad_mask` — every batch then has the same static
        # shape, so the jitted eval program compiles exactly once
        self.pad_last = pad_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples):
        out = {}
        for k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
        # pluralize image key for the engine contract
        if "image" in out:
            out["images"] = out.pop("image")
        return out

    def _make_batch(self, idx, b):
        sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
        pad = 0
        if self.pad_last and len(sel) < self.batch_size:
            pad = self.batch_size - len(sel)
            sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
        if hasattr(self.dataset, "get_batch"):
            # batched fast path (e.g. the native fused decode+crop)
            samples = self.dataset.get_batch(sel)
        else:
            samples = [self.dataset[int(i)] for i in sel]
        batch = self._collate(samples)
        if self.pad_last:
            mask = np.ones(len(sel), bool)
            if pad:
                mask[-pad:] = False
            batch["pad_mask"] = mask
        return batch

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        if self.num_workers > 0:
            yield from self._threaded_iter(idx, nb)
            return
        for b in range(nb):
            yield self._make_batch(idx, b)

    def _threaded_iter(self, idx, nb):
        """Parallel collation: `num_workers` threads each build whole
        batches (JPEG decode in the native path releases the GIL, so
        workers overlap); batches are re-ordered and yielded in sequence
        so epoch order stays deterministic."""
        from concurrent.futures import ThreadPoolExecutor

        depth = max(2, self.num_workers)
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = {}
            submitted = 0
            for b in range(min(depth, nb)):
                pending[b] = pool.submit(self._make_batch, idx, b)
                submitted += 1
            for b in range(nb):
                yield pending.pop(b).result()
                if submitted < nb:
                    pending[submitted] = pool.submit(self._make_batch, idx,
                                                     submitted)
                    submitted += 1


def prefetch_to_device(iterator, mesh=None, depth: int = 2):
    """Keep `depth` batches in flight on device (double buffering).

    With a mesh, batches are placed batch-sharded on the 'data' axis;
    without, plain device_put. This is the pinned-memory/prefetch_factor
    analog — it hides host collation + transfer behind compute.
    """
    import jax

    from tpupose.parallel.mesh import shard_batch

    def place(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    buf = collections.deque()
    for batch in iterator:
        buf.append(place(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
