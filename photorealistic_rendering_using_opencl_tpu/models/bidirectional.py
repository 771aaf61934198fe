"""Bidirectional path tracing -- declared future work, like the reference.

The reference ships an empty ``kernels/integrators/bidirectional.cl`` and
lists BDPT under future work (README.md:57); this module is the explicit
TPU-side placeholder so the parity table has a one-to-one row.  The
adjoint machinery BDPT needs already exists in ops/bsdf.py (``sample``
carries the non-adjoint eta^2 radiance scaling of the reference's BSDF2,
bxdf.cl:105-143); the missing pieces are light-subpath generation and the
connection strategy weights.
"""
from __future__ import annotations


def trace(*args, **kwargs):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "BDPT is future work (matching the reference's empty "
        "bidirectional.cl); use models.integrator.trace (unidirectional "
        "path tracing with NEE/MIS).")
