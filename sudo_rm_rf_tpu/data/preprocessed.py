"""Loader for joblib per-utterance preprocessed dirs (the "legacy end2end"
format).

Reference: `sudo_rm_rf/dnn/dataset_loader/torch_dataloader.py` — folders of
joblib-dumped items per utterance, with selectable return items including
normalized variants (`:99-110`). Produced here by
prep.convert_wsj0mix_to_universal (mixture_wav, clean_wav_{i}, wav).
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence

import joblib
import numpy as np

from sudo_rm_rf_tpu.data.base import DatasetConfigError, check_arg


def _to_numpy(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


class PreprocessedDataset:
    """Yields tuples of the requested items, each (…, T) float32."""

    def __init__(self, **kwargs):
        self.root = check_arg(kwargs, "root_dirpath", str,
                              extra_checks=[os.path.lexists])
        self.return_items = check_arg(
            kwargs, "return_items", list, default=["mixture_wav", "clean_wav_0",
                                                   "clean_wav_1"],
        )
        self.n_samples = check_arg(
            kwargs, "n_samples", int, default=0, extra_checks=[lambda x: x >= 0]
        )
        self.folders: List[str] = sorted(
            d for d in glob.glob(os.path.join(self.root, "*")) if os.path.isdir(d)
        )
        if not self.folders:
            raise DatasetConfigError(f"no utterance folders under {self.root}")
        if self.n_samples > 0:
            self.folders = self.folders[: self.n_samples]

    def __len__(self):
        return len(self.folders)

    def __getitem__(self, idx):
        folder = self.folders[idx]
        out = []
        for item in self.return_items:
            path = os.path.join(folder, item)
            try:
                data = _to_numpy(joblib.load(path)).astype(np.float32)
            except Exception as exc:
                raise IOError(f"failed to load {path}: {exc}")
            out.append(data.squeeze(0) if data.ndim > 1 and data.shape[0] == 1 else data)
        return tuple(out)

    def get_generator(self, batch_size=4, shuffle=True, num_workers=4, **kw):
        from sudo_rm_rf_tpu.data.loader import DataLoader

        return DataLoader(self, batch_size=batch_size, shuffle=shuffle,
                          num_workers=num_workers, drop_last=True, **kw)
