"""Sharded-tar streaming datasets (WebDataset convention).

Production-scale corpora don't fit the map-style adapters in
``utils/datasets.py`` (the reference's largest adapter, LAION
``paintmind/utils/datasets.py:20-42``, still assumes a random-access
image tree): millions of small files thrash any filesystem, and
map-style random access forces one seek per item.  The standard fix on
TPU pods is the WebDataset layout — items packed into ``.tar`` shards,
read *sequentially*, shuffled at two levels (shard order + an in-memory
reservoir), with each data-parallel rank owning a disjoint shard subset.

This module provides the three pieces:

  * :func:`write_shards` — pack an image folder (optionally with captions)
    into ``<prefix>-00000.tar`` … shards plus a ``<prefix>-index.json``
    item-count sidecar.
  * :class:`ShardedTarDataset` — a seeded, rank-shardable, resumable
    iterable over the shards yielding ``img`` or ``(img, caption)`` items
    (same item contract as utils/data.DataLoader's map-style sources).
  * :class:`IterableDataLoader` — batches any such iterable with a
    background prefetch thread; drop-in for the trainers' external
    ``train_loader=`` / ``valid_loader=`` hooks.

Tar members pair by key: ``<key>.jpg``/``.png``/``.jpeg`` is the image,
an optional ``<key>.txt`` the caption — the WebDataset convention, so
shards written by the reference ecosystem's tooling read here unchanged.
"""

from __future__ import annotations

import glob as _glob
import io
import json
import os
import queue
import tarfile
import threading

import numpy as np
from PIL import Image

from .data import default_collate

_IMG_EXTS = ('.jpg', '.jpeg', '.png', '.webp', '.bmp')


def write_shards(image_dir, out_prefix, shard_size=1000, captions=None,
                 exts=_IMG_EXTS):
    """Pack ``image_dir``'s images into tar shards of ``shard_size`` items.

    ``captions``: optional ``{filename: str}`` (or a callable
    ``filename -> str``); when given, each item also gets a ``.txt``
    member.  Returns the list of shard paths.  Writes
    ``<out_prefix>-index.json`` with per-shard item counts so readers
    know ``len()`` without scanning tar headers.
    """
    files = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith(tuple(exts)))
    if not files:
        raise FileNotFoundError(f'no images under {image_dir!r}')
    os.makedirs(os.path.dirname(os.path.abspath(out_prefix)), exist_ok=True)
    shards, counts = [], []
    for s in range(0, len(files), shard_size):
        path = f'{out_prefix}-{s // shard_size:05d}.tar'
        with tarfile.open(path, 'w') as tf:
            for name in files[s:s + shard_size]:
                tf.add(os.path.join(image_dir, name), arcname=name)
                cap = (captions(name) if callable(captions)
                       else captions.get(name)) if captions else None
                if cap is not None:
                    data = str(cap).encode()
                    info = tarfile.TarInfo(os.path.splitext(name)[0] + '.txt')
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        shards.append(path)
        counts.append(len(files[s:s + shard_size]))
    with open(f'{out_prefix}-index.json', 'w') as f:
        json.dump({'shards': [os.path.basename(p) for p in shards],
                   'counts': counts}, f)
    return shards


def _shard_items(path):
    """Stream one tar shard sequentially, yielding (key, img_bytes, txt)."""
    with tarfile.open(path, 'r') as tf:
        img, txt, key = None, None, None
        for info in tf:
            if not info.isfile():
                continue
            base, ext = os.path.splitext(info.name)
            if key is not None and base != key:
                if img is not None:
                    yield key, img, txt
                img, txt = None, None
            key = base
            data = tf.extractfile(info).read()
            if ext.lower() in _IMG_EXTS:
                img = data
            elif ext.lower() == '.txt':
                txt = data.decode('utf-8', 'replace')
        if img is not None:
            yield key, img, txt


class ShardedTarDataset:
    """Seeded, rank-shardable, resumable stream over WebDataset tar shards.

    ``pattern``: a glob (``.../train-*.tar``), an explicit list of paths,
    or an ``<prefix>-index.json`` written by :func:`write_shards`.

    Multi-host data parallelism: pass ``rank``/``world_size`` (e.g.
    ``jax.process_index()``/``jax.process_count()``) and each rank reads
    the shard subset ``shards[rank::world_size]`` — disjoint by
    construction, no coordination traffic.  Shard order reshuffles every
    epoch from ``seed + epoch``; ``shuffle_buffer`` adds an in-memory
    reservoir shuffle within the stream (sequential tar reads stay
    sequential).  ``set_epoch(e)`` / ``state()`` give shard-granular
    resume: a restored run skips whole shards already consumed.
    """

    def __init__(self, pattern, transform=None, shuffle_buffer=0, seed=0,
                 rank=0, world_size=1, with_captions='auto'):
        if isinstance(pattern, (list, tuple)):
            shards = [str(p) for p in pattern]
        elif str(pattern).endswith('.json'):
            with open(pattern) as f:
                idx = json.load(f)
            base = os.path.dirname(os.path.abspath(pattern))
            shards = [os.path.join(base, s) for s in idx['shards']]
            self._counts = dict(zip(shards, idx['counts']))
        else:
            shards = sorted(_glob.glob(str(pattern)))
        if not shards:
            raise FileNotFoundError(f'no shards match {pattern!r}')
        if not (0 <= rank < world_size):
            raise ValueError(f'rank {rank} outside world_size {world_size}')
        self.shards = shards[rank::world_size]
        if not self.shards:
            raise ValueError(f'rank {rank}: no shards for this rank '
                             f'({len(shards)} total, world {world_size})')
        self.transform = transform
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.with_captions = with_captions
        self.epoch = 0
        self._start_shard = 0  # resume offset within the current epoch

    def __len__(self):
        if not hasattr(self, '_counts'):
            self._counts = {}
        for s in self.shards:
            if s not in self._counts:
                with tarfile.open(s, 'r') as tf:
                    self._counts[s] = sum(
                        1 for i in tf if i.isfile() and
                        os.path.splitext(i.name)[1].lower() in _IMG_EXTS)
        return sum(self._counts[s] for s in self.shards)

    def set_epoch(self, epoch, start_shard=0):
        self.epoch = int(epoch)
        self._start_shard = int(start_shard)
        return self

    def state(self):
        """Shard-granular resume point (feed back via set_epoch)."""
        return {'epoch': self.epoch, 'start_shard': self._start_shard}

    def _epoch_shards(self):
        order = np.random.default_rng(
            self.seed + self.epoch).permutation(len(self.shards))
        return [self.shards[i] for i in order]

    def _decode(self, img_bytes, txt):
        img = Image.open(io.BytesIO(img_bytes)).convert('RGB')
        if self.transform is not None:
            img = self.transform(img)
        want_cap = (txt is not None if self.with_captions == 'auto'
                    else self.with_captions)
        return (img, txt if txt is not None else '') if want_cap else img

    def __iter__(self):
        rng = np.random.default_rng(self.seed + 7919 * (self.epoch + 1))
        buf = []
        shards = self._epoch_shards()
        for si in range(self._start_shard, len(shards)):
            self._start_shard = si  # state(): this shard not yet done
            for _key, img_bytes, txt in _shard_items(shards[si]):
                if self.shuffle_buffer > 1:
                    buf.append((img_bytes, txt))
                    if len(buf) >= self.shuffle_buffer:
                        j = int(rng.integers(len(buf)))
                        buf[j], item = buf[-1], buf[j]
                        buf.pop()
                        yield self._decode(*item)
                else:
                    yield self._decode(img_bytes, txt)
        while buf:
            j = int(rng.integers(len(buf)))
            buf[j], item = buf[-1], buf[j]
            buf.pop()
            yield self._decode(*item)
        self.epoch += 1
        self._start_shard = 0


class IterableDataLoader:
    """Batch an iterable dataset with one background prefetch thread.

    Mirrors utils/data.DataLoader's contract (``__len__`` in batches,
    ``collate_fn``, ``drop_last``, error surfacing, safe mid-epoch break)
    for sources that stream instead of random-access — the trainers accept
    it through their ``train_loader=``/``valid_loader=`` hooks unchanged.
    """

    def __init__(self, dataset, batch_size, drop_last=True,
                 collate_fn=default_collate, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END, _ERR = object(), object()

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                items = []
                for it in self.dataset:
                    items.append(it)
                    if len(items) == self.batch_size:
                        if not _put(self.collate_fn(items)):
                            return
                        items = []
                if items and not self.drop_last:
                    if not _put(self.collate_fn(items)):
                        return
                _put(_END)
            except BaseException as e:  # surface errors, never hang
                _put((_ERR, e))

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                batch = q.get()
                if batch is _END:
                    break
                if isinstance(batch, tuple) and len(batch) == 2 \
                        and batch[0] is _ERR:
                    raise RuntimeError('IterableDataLoader failed') from batch[1]
                yield batch
        finally:
            stop.set()
