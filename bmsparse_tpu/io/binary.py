"""Binary persistence of BmSparse matrices.

The reference includes cusp/io/binary.h under the comment "Dumping bmSparse
matrices to disk" (ref: src/bmSparse_SPGEMM.cu:21-27) but the dump code did
not survive; CUSP provides matrix persistence (cusp/cusp/io/binary.h). This
module supplies that capability natively: a versioned .npz dump of the five
format arrays plus metadata, so converted matrices can be cached between
benchmark runs.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..format.bmsparse import BmSparse

_FORMAT_VERSION = 1


def save_bmsparse(path: str, m: BmSparse) -> None:
    nb = int(m.nb)
    np.savez_compressed(
        path,
        version=np.int32(_FORMAT_VERSION),
        brow=np.asarray(m.brow)[:nb],
        bcol=np.asarray(m.bcol)[:nb],
        bmp_hi=np.asarray(m.bmp_hi)[:nb],
        bmp_lo=np.asarray(m.bmp_lo)[:nb],
        offsets=np.asarray(m.offsets)[:nb],
        values=np.asarray(m.values)[: m.nnz],
        meta=np.array(
            [m.num_rows, m.num_cols, m.nnz, int(m.transposed)], np.int64
        ),
    )


def load_bmsparse(path: str) -> BmSparse:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unsupported bmsparse dump version {z['version']}")
        nr, nc, nnz, transposed = (int(x) for x in z["meta"])
        nb = len(z["brow"])
        return BmSparse(
            brow=jnp.asarray(z["brow"], jnp.int32),
            bcol=jnp.asarray(z["bcol"], jnp.int32),
            bmp_hi=jnp.asarray(z["bmp_hi"], jnp.uint32),
            bmp_lo=jnp.asarray(z["bmp_lo"], jnp.uint32),
            offsets=jnp.asarray(z["offsets"], jnp.int32),
            values=jnp.asarray(z["values"]),
            nb=jnp.int32(nb),
            num_rows=nr,
            num_cols=nc,
            nnz=nnz,
            transposed=bool(transposed),
        )
