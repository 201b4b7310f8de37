"""Sign-margin guards for the dual-engine ANN oracles.

ext_ann_lsh's oracle (extensions.py:_lsh_oracle_sql) and the IVF medoid
assignment compare float expressions across engines whose folds may differ
in the last ulp (~1e-15 relative). Divergence is only possible when a
compared quantity sits within that noise of a decision boundary. These
tests pin the actual margins on the driver corpora — if a regenerated
corpus ever lands a vector near a boundary, this fails loudly BEFORE the
driver's hash compare does.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from dbt_pro3_spark.ext.similarity import hyperplanes

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def _matrix(sf: str) -> np.ndarray:
    t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet").to_pandas()
    return np.stack(t["embedding"].to_numpy()).astype(np.float64)


@pytest.mark.parametrize("sf", SFS)
def test_lsh_sign_margin(sf):
    planes = np.array(hyperplanes(64, 4))
    margin = np.abs(_matrix(sf) @ planes.T).min()
    # measured >= 2.7e-4 at every SF; 1e-5 still dwarfs fold-order noise
    assert margin >= 1e-5, f"{sf}: |dot| margin {margin:.2e} too close to 0"


@pytest.mark.parametrize("sf", SFS)
def test_ivf_assignment_margins(sf):
    """ext_ann_ivf's two argmin boundaries: corpus cell assignment (gap
    between 1st/2nd nearest medoid) and query nprobe cut (2nd/3rd). Both
    engines compute d2 with possibly different summation order; the gaps
    (measured >= 3.6e-6) dwarf that ~1e-15-relative noise."""
    import hashlib

    t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    h = np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    seeds = m[np.lexsort((ids, h))[:16]]
    d2 = np.sort(((m[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2), axis=1)
    gap12 = (d2[:, 1] - d2[:, 0]).min()
    gap23 = (d2[ids < 10, 2] - d2[ids < 10, 1]).min()
    assert gap12 >= 1e-7, f"{sf}: cell-assignment gap {gap12:.2e}"
    assert gap23 >= 1e-7, f"{sf}: nprobe gap {gap23:.2e}"


@pytest.mark.parametrize("sf", SFS)
def test_pq_code_assignment_margin(sf):
    """ext_ann_pq's per-(row, subspace) code argmin: gap between the two
    nearest codes in every subspace (measured >= 1.4e-6 at every SF)."""
    import hashlib

    t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    h = np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    seeds = m[np.lexsort((ids, h))[:16]]
    mingap = np.inf
    for j in range(8):
        s, cb = m[:, j * 8 : (j + 1) * 8], seeds[:, j * 8 : (j + 1) * 8]
        d2 = np.sort(((s[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2), axis=1)
        mingap = min(mingap, (d2[:, 1] - d2[:, 0]).min())
    assert mingap >= 1e-7, f"{sf}: PQ code gap {mingap:.2e}"
