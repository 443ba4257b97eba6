"""Array (de)serialization for the process-boundary compat layer.

Parity target: ``src/m3p2i_aip/utils/data_transfer.py:4-22`` (torch.save into
a BytesIO).  Here the wire format is ``numpy.save`` bytes — portable, no
pickle of device buffers; device placement happens on the receiving side.
"""
from __future__ import annotations

import io

import jax.numpy as jnp
import numpy as np


def array_to_bytes(x) -> bytes:
    """Serialize a jax/numpy array. Parity: torch_to_bytes (data_transfer.py:4-8)."""
    buf = io.BytesIO()
    np.save(buf, np.asarray(x), allow_pickle=False)
    return buf.getvalue()


def bytes_to_array(b: bytes) -> jnp.ndarray:
    """Deserialize to a device array. Parity: bytes_to_torch (data_transfer.py:10-12)."""
    buf = io.BytesIO(b)
    return jnp.asarray(np.load(buf, allow_pickle=False))


def bytes_to_numpy(b: bytes) -> np.ndarray:
    buf = io.BytesIO(b)
    return np.load(buf, allow_pickle=False)


# reference-compatible aliases
torch_to_bytes = array_to_bytes
bytes_to_torch = bytes_to_array
