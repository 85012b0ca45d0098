"""Axis-optional collectives.

The reference's ``sr/modules/dist.py`` wrappers no-op when
``torch.distributed`` is uninitialised so the same model code runs on
one GPU.  The JAX equivalent: collectives that take an optional axis
name and reduce only when one is bound — used by the EMA-VQ codebook
sync (``sr/modules/vq.py:71-73``) and by cross-replica metric sums.
"""
from __future__ import annotations

from typing import Optional

import jax


def psum_if(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def pmean_if(x, axis_name: Optional[str]):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)
