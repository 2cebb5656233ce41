"""Differentiable rendering.

The capability lucille's shader stack could never have: because the whole
pipeline — camera, intersection interpolation, BRDFs, light sampling,
integrators — is traced JAX, pixel losses differentiate end-to-end to
material, light and texture parameters (SURVEY.md section 7 step 6;
BASELINE.md backward-parity target).

Scope: gradients flow through SHADING — visibility (hit masks, traversal)
is piecewise-constant and contributes zero gradient, matching the
BASELINE's 'visibility detached' scope; silhouette/edge-sampling gradients
are future work.
"""

from lucille_tpu.diff.render import (
    differentiable_render,
    render_loss_and_grad,
    scene_with_params,
)

__all__ = [
    "differentiable_render",
    "scene_with_params",
    "render_loss_and_grad",
]
