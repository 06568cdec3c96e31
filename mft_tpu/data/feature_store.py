"""Pre-extracted feature store.

Capability parity with reference data/feature_loader.py (the HDF5 loader
serving the upstream cdfsl-benchmark ``save_features.py``/``test.py``
workflow whose scripts are absent from the reference repo — SURVEY.md §2.1).
The contract is preserved: a file holding ``{all_feats [N, feat],
all_labels [N], count}`` loaded into a per-class feature dict
(feature_loader.py:25-55); the container here is ``.npz`` instead of HDF5
(no h5py dependency needed on the write path, and the arrays are small).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def save_features(path: str, all_feats: np.ndarray, all_labels: np.ndarray) -> None:
    """Write the feature bank (reference save_features.py output contract)."""
    np.savez(path, all_feats=np.asarray(all_feats), all_labels=np.asarray(all_labels), count=len(all_labels))


def load_features(path: str) -> Dict[int, np.ndarray]:
    """Load into a per-class dict of [n_i, feat] arrays — the reference
    ``init_loader`` contract (feature_loader.py:25-55)."""
    if path.endswith((".hdf5", ".h5")):
        import h5py  # the reference's container; read-compat only

        with h5py.File(path, "r") as f:
            count = int(f["count"][()]) if "count" in f else len(f["all_labels"])
            feats = np.asarray(f["all_feats"][:count])
            labels = np.asarray(f["all_labels"][:count])
    else:
        d = np.load(path)
        count = int(d["count"])
        feats = d["all_feats"][:count]
        labels = d["all_labels"][:count]
    out: Dict[int, np.ndarray] = {}
    for c in np.unique(labels):
        out[int(c)] = feats[labels == c]
    return out


def sample_feature_episode(cl_data: Dict[int, np.ndarray], n_way: int, n_support: int, n_query: int, rs: np.random.Generator):
    """[n_way, n_support+n_query, feat] episode from the per-class dict
    (the upstream test.py episode construction)."""
    classes = rs.permutation(sorted(cl_data))[:n_way]
    per = n_support + n_query
    eps = []
    for c in classes:
        pool = cl_data[int(c)]
        idx = rs.choice(len(pool), size=per, replace=len(pool) < per)
        eps.append(pool[idx])
    return np.stack(eps), classes
