"""Behavioral tests for kaolin_tpu.io.dataset, mirroring the reference's
test strategy (reference tests/python/kaolin/io/test_dataset.py:61-1065):
Cache memoization, CachedDataset lazy/eager preprocessing, transform
composition, force_overwrite, parallel workers, KaolinDataset item protocol,
and CombinationDataset zipping.
"""

import os
import pickle

import numpy as np
import pytest

from kaolin_tpu.io.dataset import (
    Cache,
    CachedDataset,
    CombinationDataset,
    KaolinDataset,
    KaolinDatasetItem,
    ProcessedDataset,
)


class CountingSource:
    """Indexable source that records how many times each item is computed."""

    def __init__(self, n=6, offset=0.0):
        self.n = n
        self.offset = offset
        self.reads = np.zeros(n, dtype=int)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if not 0 <= i < self.n:
            raise IndexError(i)
        self.reads[i] += 1
        return {
            "pts": np.full((4, 3), float(i) + self.offset, np.float32),
            "label": i,
        }


def _double(item):
    return {"pts": item["pts"] * 2.0, "label": item["label"]}


def _negate(item):
    return {"pts": -item["pts"], "label": item["label"]}


class TestCache:
    def test_memoizes_by_name(self, tmp_path):
        calls = []

        def f(x):
            calls.append(x)
            return x * 10

        cache = Cache(f, tmp_path, cache_key="k1")
        assert cache("a", 3) == 30
        assert cache("a", 999) == 30  # cached: args ignored on hit
        assert calls == [3]
        assert cache("b", 4) == 40
        assert calls == [3, 4]

    def test_cache_key_partitions(self, tmp_path):
        c1 = Cache(lambda: "one", tmp_path, cache_key="k1")
        c2 = Cache(lambda: "two", tmp_path, cache_key="k2")
        assert c1("same-name") == "one"
        assert c2("same-name") == "two"

    def test_persists_across_instances(self, tmp_path):
        Cache(lambda: {"x": np.arange(3)}, tmp_path, cache_key="p")("item")
        reloaded = Cache(lambda: pytest.fail("must hit cache"),
                         tmp_path, cache_key="p")("item")
        np.testing.assert_array_equal(reloaded["x"], np.arange(3))


class TestCachedDataset:
    @pytest.mark.parametrize("use_transform", [False, True])
    def test_no_cache_dir(self, use_transform):
        src = CountingSource()
        ds = CachedDataset(src, preprocessing_transform=_double,
                           transform=_negate if use_transform else None)
        assert len(ds) == len(src)
        item = ds[2]
        expect = 2.0 * 2.0 * (-1.0 if use_transform else 1.0)
        np.testing.assert_allclose(item["pts"], expect)
        # no caching: re-reading recomputes from source
        ds[2]
        assert src.reads[2] == 2

    @pytest.mark.parametrize("use_transform", [False, True])
    def test_lazy_cache(self, tmp_path, use_transform):
        src = CountingSource()
        ds = CachedDataset(src, preprocessing_transform=_double,
                           transform=_negate if use_transform else None,
                           cache_dir=tmp_path)
        sign = -1.0 if use_transform else 1.0
        for _ in range(3):
            np.testing.assert_allclose(ds[1]["pts"], sign * 2.0)
        assert src.reads[1] == 1  # preprocessed once, then served from disk
        assert src.reads[0] == 0  # lazy: untouched items not preprocessed
        # the at-read transform must NOT be baked into the cache
        raw = pickle.load(open(ds._cache_path(1), "rb"))
        np.testing.assert_allclose(raw["pts"], 2.0)

    def test_eager_preprocessing_serial_fallback(self, tmp_path):
        # CountingSource with live state is unpicklable only if we force it;
        # num_workers=1 takes the serial path by design.
        src = CountingSource()
        CachedDataset(src, preprocessing_transform=_double,
                      cache_dir=tmp_path, num_workers=1)
        assert src.reads.sum() == len(src)  # everything preprocessed up front
        files = [f for f in os.listdir(tmp_path) if f.startswith("item_")]
        assert len(files) == len(src)

    def test_eager_preprocessing_parallel(self, tmp_path):
        src = CountingSource(n=5)
        ds = CachedDataset(src, preprocessing_transform=_double,
                           cache_dir=tmp_path, num_workers=2)
        for i in range(5):
            np.testing.assert_allclose(ds[i]["pts"], 2.0 * i)
        assert src.reads.sum() == 0  # parent never computed: workers did

    def test_unpicklable_falls_back_to_serial(self, tmp_path):
        src = CountingSource(n=3)
        closure_state = {"scale": 3.0}
        transform = lambda it: {  # noqa: E731 - deliberately unpicklable
            "pts": it["pts"] * closure_state["scale"], "label": it["label"]}
        with pytest.warns(UserWarning, match="falling back to serial"):
            ds = CachedDataset(src, preprocessing_transform=transform,
                               cache_dir=tmp_path, num_workers=4)
        np.testing.assert_allclose(ds[2]["pts"], 6.0)

    def test_force_overwrite(self, tmp_path):
        src1 = CountingSource(offset=0.0)
        ds1 = CachedDataset(src1, preprocessing_transform=_double,
                            cache_dir=tmp_path)
        np.testing.assert_allclose(ds1[0]["pts"], 0.0)
        # a second dataset over the same cache_dir sees stale items...
        src2 = CountingSource(offset=10.0)
        ds2 = CachedDataset(src2, preprocessing_transform=_double,
                            cache_dir=tmp_path)
        np.testing.assert_allclose(ds2[0]["pts"], 0.0)
        assert src2.reads[0] == 0
        # ...unless force_overwrite recomputes
        ds3 = CachedDataset(src2, preprocessing_transform=_double,
                            cache_dir=tmp_path, force_overwrite=True)
        np.testing.assert_allclose(ds3[0]["pts"], 20.0)

    def test_no_preprocessing_passthrough(self, tmp_path):
        src = CountingSource()
        ds = CachedDataset(src, cache_dir=tmp_path)
        np.testing.assert_allclose(ds[3]["pts"], 3.0)
        ds[3]
        assert src.reads[3] == 2  # nothing to cache without a transform

    def test_cache_is_numpy(self, tmp_path):
        import jax.numpy as jnp
        src = CountingSource(n=2)
        ds = CachedDataset(
            src,
            preprocessing_transform=lambda it: {"pts": jnp.asarray(it["pts"])},
            cache_dir=tmp_path)
        ds[0]
        raw = pickle.load(open(ds._cache_path(0), "rb"))
        assert isinstance(raw["pts"], np.ndarray)  # device arrays not pickled


class TestKaolinDataset:
    class Squares(KaolinDataset):
        def initialize(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def get_data(self, i):
            return i * i

        def get_attributes(self, i):
            return {"name": f"sq{i}"}

    def test_item_protocol(self):
        ds = self.Squares(4)
        assert len(ds) == 4
        item = ds[3]
        assert isinstance(item, KaolinDatasetItem)
        assert item.data == 9
        assert item.attributes == {"name": "sq3"}
        data, attrs = item  # namedtuple unpacking, ref test_dataset.py:997
        assert (data, attrs) == (9, {"name": "sq3"})

    def test_abstract_methods_raise(self):
        with pytest.raises(NotImplementedError):
            KaolinDataset()


class TestCombinationDataset:
    def test_zips_kaolin_and_plain(self):
        kds = TestKaolinDataset.Squares(3)
        plain = [10, 11, 12]
        combo = CombinationDataset(kds, plain)
        assert len(combo) == 3
        item = combo[2]
        assert item.data == (4, 12)
        assert item.attributes == ({"name": "sq2"}, {})

    def test_length_mismatch_rejected(self):
        with pytest.raises(AssertionError):
            CombinationDataset([1, 2, 3], [1, 2])


def test_processed_dataset_deprecated(tmp_path):
    src = CountingSource(n=2)
    with pytest.warns(DeprecationWarning):
        ds = ProcessedDataset(src, preprocessing_transform=_double,
                              cache_dir=tmp_path)
    np.testing.assert_allclose(ds[1]["pts"], 2.0)
