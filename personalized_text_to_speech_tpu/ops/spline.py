"""Monotonic rational-quadratic spline transforms (neural spline flows).

Math parity with the reference implementation of Durkan et al.'s RQS
(reference ``transforms.py:12-193``), re-expressed branch-free for XLA: the
reference routes inside/outside-interval elements through boolean fancy
indexing, which is data-dependent shape — here both paths are computed and
merged with ``where`` so everything stays static-shaped and vectorized.

Shapes: ``inputs [...]``, ``unnormalized_{widths,heights} [..., K]``,
``unnormalized_derivatives [..., K-1]`` (interior knots; linear tails add the
two boundary derivatives).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations: jnp.ndarray, inputs: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Index of the bin each input falls into (reference ``transforms.py:47-52``)."""
    locs = bin_locations.at[..., -1].add(eps)
    return jnp.sum((inputs[..., None] >= locs).astype(jnp.int32), axis=-1) - 1


def _gather_last(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core monotonic RQS on the interval; returns (outputs, logabsdet)."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    # pin the endpoints exactly
    cumwidths = jnp.concatenate(
        [
            jnp.full_like(cumwidths[..., :1], left),
            cumwidths[..., 1:-1],
            jnp.full_like(cumwidths[..., -1:], right),
        ],
        axis=-1,
    )
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = jnp.concatenate(
        [
            jnp.full_like(cumheights[..., :1], bottom),
            cumheights[..., 1:-1],
            jnp.full_like(cumheights[..., -1:], top),
        ],
        axis=-1,
    )
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)
    else:
        bin_idx = _searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    input_cumwidths = _gather_last(cumwidths, bin_idx)
    input_bin_widths = _gather_last(widths, bin_idx)
    input_cumheights = _gather_last(cumheights, bin_idx)
    delta = heights / widths
    input_delta = _gather_last(delta, bin_idx)
    input_derivatives = _gather_last(derivatives, bin_idx)
    input_derivatives_p1 = _gather_last(derivatives[..., 1:], bin_idx)
    input_heights = _gather_last(heights, bin_idx)

    d_sum = input_derivatives + input_derivatives_p1 - 2 * input_delta

    if inverse:
        shifted = inputs - input_cumheights
        a = shifted * d_sum + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - shifted * d_sum
        c = -input_delta * shifted
        discriminant = b ** 2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + d_sum * theta_one_minus_theta
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_p1 * root ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta ** 2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + d_sum * theta_one_minus_theta
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_p1 * theta ** 2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RQS with identity linear tails outside ``[-tail_bound, tail_bound]``
    (reference ``transforms.py:55-94``).  Branch-free: inside/outside merged
    with ``where``; inputs are clipped into the interval before the spline so
    the math stays finite everywhere."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    constant = math.log(math.exp(1 - min_derivative) - 1)
    pad_cfg = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    derivs = jnp.pad(unnormalized_derivatives, pad_cfg, constant_values=constant)

    clipped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_logdet = rational_quadratic_spline(
        clipped,
        unnormalized_widths,
        unnormalized_heights,
        derivs,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_logdet, jnp.zeros_like(inputs))
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: str = None,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch wrapper (reference ``transforms.py:12-44``)."""
    if tails is None:
        return rational_quadratic_spline(
            inputs,
            unnormalized_widths,
            unnormalized_heights,
            unnormalized_derivatives,
            inverse=inverse,
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")
    return unconstrained_rational_quadratic_spline(
        inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        tail_bound=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
