"""Dataset utilities: preprocess-once caching.

TPU-native analog of reference ``kaolin/io/dataset.py`` (CachedDataset :125,
preprocessing Pool :28,201). Host-side (data loading is not device work);
multiprocessing preprocessing uses a process pool like the reference.
"""

import hashlib
import os
import pickle

import numpy as np
from collections import namedtuple

__all__ = ["Cache", "CachedDataset"]


class Cache:
    """Disk-backed memoization of a function by name/key. Ref :44."""

    def __init__(self, func, cache_dir, cache_key=""):
        self.func = func
        self.cache_dir = os.path.abspath(cache_dir)
        self.cache_key = cache_key
        os.makedirs(self.cache_dir, exist_ok=True)

    def _path(self, name):
        h = hashlib.sha1(f"{self.cache_key}:{name}".encode()).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"{h}.pkl")

    def __call__(self, name, *args, **kwargs):
        p = self._path(name)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pickle.load(f)
        out = self.func(*args, **kwargs)
        with open(p, "wb") as f:
            pickle.dump(out, f)
        return out


class CachedDataset:
    """Wrap a source dataset with a preprocessing function whose outputs are
    cached to disk on first access (or ahead of time). Ref :125.

    Args:
        source: indexable dataset (len + getitem).
        preprocessing_transform: applied once, cached.
        transform: applied at read time (not cached).
        cache_dir: where to store the cache; None disables caching.
        num_workers: parallel preprocessing workers (0 = lazy, in-process).
        force_overwrite: recompute even if cached.
    """

    def __init__(self, source, preprocessing_transform=None, transform=None,
                 cache_dir=None, num_workers=0, force_overwrite=False):
        self.source = source
        self.preprocessing_transform = preprocessing_transform
        self.transform = transform
        self.cache_dir = cache_dir
        self.force_overwrite = force_overwrite
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
        if num_workers and cache_dir is not None \
                and preprocessing_transform is not None:
            self._preprocess_all(num_workers)

    def _cache_path(self, index):
        return os.path.join(self.cache_dir, f"item_{index:08d}.pkl")

    def _compute(self, index):
        item = self.source[index]
        if self.preprocessing_transform is not None:
            item = self.preprocessing_transform(item)
        return item

    def _get_preprocessed(self, index):
        if self.cache_dir is None or self.preprocessing_transform is None:
            return self._compute(index)
        p = self._cache_path(index)
        if os.path.exists(p) and not self.force_overwrite:
            with open(p, "rb") as f:
                return pickle.load(f)
        item = self._compute(index)
        with open(p, "wb") as f:
            pickle.dump(_to_numpy(item), f)
        return item

    def _preprocess_all(self, num_workers):
        """Preprocess every item up front, in parallel across host processes
        (the analog of the reference's ``torch.multiprocessing.Pool``,
        io/dataset.py:199-201).

        Workers run in a *spawn* context — fork is unsafe once jax/XLA is
        initialized in the parent — and write the pickled numpy caches
        themselves, so nothing heavy flows back through the pool. Requires
        ``source`` and ``preprocessing_transform`` to be picklable; if the
        pool cannot be set up (unpicklable closures, restricted platforms),
        falls back to the serial in-process loop."""
        todo = [i for i in range(len(self))
                if self.force_overwrite
                or not os.path.exists(self._cache_path(i))]
        if not todo:
            return
        if num_workers and num_workers > 1:
            import multiprocessing as mp
            try:
                ctx = mp.get_context("spawn")
                with ctx.Pool(
                        min(num_workers, len(todo)),
                        initializer=_pool_init,
                        initargs=(self.source, self.preprocessing_transform,
                                  self.cache_dir)) as pool:
                    for _ in pool.imap_unordered(_pool_preprocess, todo,
                                                 chunksize=4):
                        pass
                return
            except Exception as e:  # unpicklable source/transform, etc.
                import warnings
                warnings.warn(
                    f"parallel preprocessing failed ({e!r}); "
                    "falling back to serial")
        for i in todo:
            self._get_preprocessed(i)

    def __len__(self):
        return len(self.source)

    def __getitem__(self, index):
        item = self._get_preprocessed(index)
        if self.transform is not None:
            item = self.transform(item)
        return item


_POOL_STATE = {}


def _pool_init(source, preprocessing_transform, cache_dir):
    # runs once per spawned worker; keep device use off — force CPU so
    # workers never grab the TPU the parent may hold. Assign unconditionally:
    # spawned workers inherit the parent's JAX_PLATFORMS, so setdefault would
    # be a no-op whenever the parent exported one (e.g. a TPU platform).
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _POOL_STATE["source"] = source
    _POOL_STATE["transform"] = preprocessing_transform
    _POOL_STATE["cache_dir"] = cache_dir


def _pool_preprocess(index):
    item = _POOL_STATE["source"][index]
    transform = _POOL_STATE["transform"]
    if transform is not None:
        item = transform(item)
    path = os.path.join(_POOL_STATE["cache_dir"], f"item_{index:08d}.pkl")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(item), f)
    os.replace(tmp, path)
    return index


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy(v) for v in tree)
    try:
        return np.asarray(tree)
    except Exception:
        return tree


KaolinDatasetItem = namedtuple("KaolinDatasetItem", ["data", "attributes"])


class KaolinDataset:
    """Dataset returning ``KaolinDatasetItem(data, attributes)``; subclasses
    implement ``initialize``, ``get_data``, ``get_attributes``, ``__len__``.
    Ref ``io/dataset.py`` (KaolinDataset)."""

    def __init__(self, *args, **kwargs):
        self.initialize(*args, **kwargs)

    def initialize(self, *args, **kwargs):
        raise NotImplementedError

    def get_data(self, index):
        raise NotImplementedError

    def get_attributes(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        return KaolinDatasetItem(data=self.get_data(index),
                                 attributes=self.get_attributes(index))


class CombinationDataset(KaolinDataset):
    """Zips several datasets: data is a tuple of each dataset's data,
    attributes a tuple of their attributes. Ref (CombinationDataset)."""

    def initialize(self, *datasets):
        assert datasets, "at least one dataset required"
        self.len = len(datasets[0])
        for ds in datasets:
            assert len(ds) == self.len, "datasets must have equal length"
        self.datasets = datasets

    def __len__(self):
        return self.len

    def get_data(self, index):
        return tuple(_field(ds[index], 0) for ds in self.datasets)

    def get_attributes(self, index):
        return tuple(_field(ds[index], 1) for ds in self.datasets)


def _field(item, i):
    if isinstance(item, KaolinDatasetItem):
        return item[i]
    return item if i == 0 else {}


class ProcessedDataset(CachedDataset):
    """Deprecated alias of :class:`CachedDataset`. Ref (ProcessedDataset)."""

    def __init__(self, dataset, preprocessing_transform=None, cache_dir=None,
                 num_workers=None, transform=None, no_progress=False):
        import warnings
        warnings.warn("ProcessedDataset is deprecated; use CachedDataset",
                      DeprecationWarning)
        super().__init__(dataset,
                         preprocessing_transform=preprocessing_transform,
                         transform=transform, cache_dir=cache_dir,
                         num_workers=num_workers or 0)
