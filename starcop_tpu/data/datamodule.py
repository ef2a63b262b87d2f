"""Data module: tiling, weighted sampling, and batch iteration.

Re-design of the reference Permian2019DataModule
(/root/reference/starcop/data/datamodule.py:17-322):

  * ``tile_rows``: expand 512x512 index rows into training windows
    (training_size with overlap, reference tiled_dataframe datamodule.py:17-64),
    computing per-tile plume fraction and the has_plume > 10/64^2 rule;
  * ``sample_weights`` + ``WeightedSampler``: balanced plume/background
    sampling with replacement (reference add_sample_weight datamodule.py:273-315);
  * ``BatchLoader``: deterministic batcher with optional weighted sampling and
    a double-buffered host->device prefetch hook (the TPU feed path).
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from starcop_tpu.data.dataset import ChipDataset, read_index_csv


def create_windows(height: int, width: int, size: int, overlap: int) -> List[Dict[str, int]]:
    """Sliding windows covering (height, width) with the given overlap.

    Delegates to mining.sliding_window_offsets (single implementation of the
    edge handling: the tail window is added only when it fits, so chips
    smaller than the window never produce negative offsets).
    """
    from starcop_tpu.data.mining import sliding_window_offsets

    return [
        {"window_row_off": r, "window_col_off": c, "window_width": size, "window_height": size}
        for r, c in sliding_window_offsets(height, width, size, overlap)
    ]


def tile_rows(
    rows: Sequence[Dict],
    training_size: int = 128,
    overlap: int = 64,
    label_product: str = "labelbinary",
) -> List[Dict]:
    """Expand chip rows into training-window rows with plume statistics.

    Per window: frac_positives = mean(label), has_plume = positives >
    10 * size^2 / 64^2 pixels (reference datamodule.py:50 for 128x128: 10/64^2
    fraction threshold).
    """
    from starcop_tpu.data.dataset import _read_product

    out = []
    threshold_frac = 10.0 / (64.0**2)
    for row in rows:
        base_c = row.get("window_col_off", 0)
        base_r = row.get("window_row_off", 0)
        h = row.get("window_height", 512)
        w = row.get("window_width", 512)
        label = _read_product(row["folder"], label_product, (base_c, base_r, w, h))
        for win in create_windows(h, w, training_size, overlap):
            sub = label[
                win["window_row_off"] : win["window_row_off"] + training_size,
                win["window_col_off"] : win["window_col_off"] + training_size,
            ]
            frac = float(sub.mean())
            new_row = dict(row)
            new_row.update(
                window_col_off=base_c + win["window_col_off"],
                window_row_off=base_r + win["window_row_off"],
                window_width=training_size,
                window_height=training_size,
                frac_positives=frac,
                has_plume=frac > threshold_frac,
                id=f"{row.get('id', '')}_r{win['window_row_off']}_c{win['window_col_off']}",
            )
            out.append(new_row)
    return out


def sample_weights(rows: Sequence[Dict]) -> np.ndarray:
    """Balanced sampling weights (reference add_sample_weight datamodule.py:309):
    plume tiles get 1/plume_fraction, background tiles 1/(1-plume_fraction)."""
    has_plume = np.asarray([bool(r.get("has_plume", False)) for r in rows])
    plume_fraction = max(float(has_plume.mean()), 1e-9)
    w = np.where(has_plume, 1.0 / plume_fraction, 1.0 / max(1.0 - plume_fraction, 1e-9))
    return w


class BatchLoader:
    """Batches a ChipDataset into the (B, C, H, W) dict protocol.

    ``weighted=True`` draws indices with replacement proportionally to
    ``sample_weights`` (the reference WeightedRandomSampler semantics);
    otherwise iterates sequentially (eval). ``num_workers > 0`` overlaps chip
    reads with device compute via a thread pool (GDAL/np.load release the GIL),
    which is the host-side half of the host->HBM prefetch pipeline.
    """

    def __init__(
        self,
        dataset: ChipDataset,
        batch_size: int = 32,
        weighted: bool = False,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.weighted = weighted
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weighted:
            w = sample_weights(self.dataset.rows)
            return self._rng.choice(n, size=n, replace=True, p=w / w.sum())
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers > 0:
            # Bounded look-ahead: keep ~2x num_workers collations in flight so
            # reads overlap compute without buffering the whole epoch in RAM.
            import collections

            window = 2 * self.num_workers
            with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
                inflight = collections.deque()
                for b in batches:
                    inflight.append(pool.submit(self._collate, b))
                    if len(inflight) > window:
                        yield inflight.popleft().result()
                while inflight:
                    yield inflight.popleft().result()
        else:
            for b in batches:
                yield self._collate(b)

    def _collate(self, indices: np.ndarray) -> Dict:
        samples = [self.dataset[int(i)] for i in indices]
        batch: Dict = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[key] = np.stack(vals)
            elif isinstance(vals[0], (int, float, bool, np.floating)):
                batch[key] = np.asarray(vals, np.float32)
            else:
                batch[key] = vals
        return batch


def prefetch_to_device(iterator, mesh=None, size: int = 2, axis_name: str = "data"):
    """Double-buffered host->device prefetch.

    Starts the (async) device transfer of the next ``size`` batches while the
    current one computes — the host->HBM half of the TPU feed pipeline (the
    native-IO threaded reads are the disk->host half). With a mesh, batches
    are placed sharded over the data axis.
    """
    import collections

    import jax
    import jax.numpy as jnp

    from starcop_tpu.parallel.mesh import shard_batch

    def place(batch):
        numeric = {}
        passthrough = {}
        for k, v in batch.items():
            arr = np.asarray(v) if not hasattr(v, "dtype") else v
            if hasattr(arr, "dtype") and np.issubdtype(np.asarray(arr).dtype, np.number):
                numeric[k] = jnp.asarray(arr)
            else:
                passthrough[k] = v
        if mesh is not None:
            numeric = shard_batch(mesh, numeric, axis_name)
        else:
            numeric = jax.device_put(numeric)
        numeric.update(passthrough)
        return numeric

    queue = collections.deque()
    for batch in iterator:
        queue.append(place(batch))  # device_put is async: transfer overlaps
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class DataModule:
    """End-to-end dataset assembly from an index CSV (the datamodule role).

    Builds the reference's five dataset views: tiled train, non-tiled train,
    train-plot, test, test-plot (sorted by (has_plume, qplume) desc —
    reference datamodule.py:221).
    """

    def __init__(
        self,
        train_csv: str,
        test_csv: Optional[str] = None,
        input_products: Sequence[str] = (
            "mag1c",
            "TOA_AVIRIS_640nm",
            "TOA_AVIRIS_550nm",
            "TOA_AVIRIS_460nm",
        ),
        output_products: Sequence[str] = ("labelbinary",),
        weight_loss_product: Optional[str] = "weight_mag1c",
        training_size: int = 128,
        training_overlap: int = 64,
        batch_size: int = 32,
        weight_sampling: bool = True,
        num_workers: int = 0,
        seed: int = 42,
        augment_rotation: str = "continuous",
    ):
        self.train_csv_path = train_csv
        self.train_rows = read_index_csv(train_csv)
        self.test_rows = read_index_csv(test_csv) if test_csv else []
        self.input_products = list(input_products)
        self.output_products = list(output_products)
        self.weight_loss_product = weight_loss_product
        self.training_size = training_size
        self.training_overlap = training_overlap
        self.batch_size = batch_size
        self.weight_sampling = weight_sampling
        self.num_workers = num_workers
        self.seed = seed
        self.augment_rotation = augment_rotation
        self._tiled_train_rows: Optional[List[Dict]] = None

    @property
    def tiled_train_rows(self) -> List[Dict]:
        """Training windows; persisted next to the train CSV like the
        reference's tiled dataframe (datamodule.py:17-64) so re-runs skip the
        label-statistics pass."""
        if self._tiled_train_rows is None:
            cache = self._tiled_cache_path()
            if cache and os.path.exists(cache):
                from starcop_tpu.data.dataset import read_index_csv

                rows = read_index_csv(cache)
                for r in rows:
                    if "frac_positives" in r and r["frac_positives"] != "":
                        r["frac_positives"] = float(r["frac_positives"])
                self._tiled_train_rows = rows
            else:
                self._tiled_train_rows = tile_rows(
                    self.train_rows, self.training_size, self.training_overlap,
                    label_product=self.output_products[0],
                )
                if cache:
                    self._write_rows_csv(cache, self._tiled_train_rows)
        return self._tiled_train_rows

    def _tiled_cache_path(self) -> Optional[str]:
        if not self.train_csv_path:
            return None
        base, ext = os.path.splitext(self.train_csv_path)
        return f"{base}_tiled_{self.training_size}_{self.training_overlap}{ext or '.csv'}"

    @staticmethod
    def _write_rows_csv(path: str, rows: List[Dict]):
        import csv

        if not rows:
            return
        keys = sorted({k for r in rows for k in r}, key=lambda k: (k != "id", k))
        with open(path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=keys)
            writer.writeheader()
            writer.writerows(rows)

    def train_dataset(self, augment: bool = True) -> ChipDataset:
        return ChipDataset(
            self.tiled_train_rows,
            self.input_products,
            self.output_products,
            self.weight_loss_product,
            augment=augment,
            augment_rotation=self.augment_rotation,
            seed=self.seed,
        )

    def test_dataset(self, sort_plot: bool = False, **kw) -> ChipDataset:
        rows = list(self.test_rows)
        if sort_plot:
            rows.sort(key=lambda r: (bool(r.get("has_plume")), r.get("qplume", 0.0)), reverse=True)
        return ChipDataset(
            rows, self.input_products, self.output_products, self.weight_loss_product, **kw
        )

    def train_loader(self) -> BatchLoader:
        return BatchLoader(
            self.train_dataset(),
            batch_size=self.batch_size,
            weighted=self.weight_sampling,
            shuffle=not self.weight_sampling,
            drop_last=True,
            seed=self.seed,
            num_workers=self.num_workers,
        )

    def test_loader(self, batch_size: int = 1, **kw) -> BatchLoader:
        return BatchLoader(self.test_dataset(**kw), batch_size=batch_size)
