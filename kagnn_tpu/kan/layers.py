"""Kolmogorov–Arnold layer modules (flax.linen).

TPU-native re-implementations of the two KAN families the reference vendors:

  * `KANLinear` / `KAN` — B-spline KAN ("efficient-kan"), semantics matching
    reference node_classification_clean/ekan.py:7-281 (weights ported from the
    torch modules produce allclose outputs; see tests/test_kan_parity.py).
  * `FastKANLayer` / `FastKAN` — RBF KAN ("fastkan"), semantics matching
    reference node_classification_clean/fastkan.py:22-145.

Mutable spline knot grids live in the 'buffers' variable collection (the
torch `register_buffer` analogue); running stats of norms live in
'batch_stats'. The hot-path compute (basis + two GEMMs) optionally dispatches
to fused Pallas kernels that keep the (batch, in, n_basis) tensor out of HBM.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.kan import bspline, rbf

Array = jax.Array


def kaiming_uniform_init(a: float, shape_fan_in_last: bool = True):
    """torch.nn.init.kaiming_uniform_(w, a) for weight (out, in):
    gain = sqrt(2 / (1 + a^2)); bound = gain * sqrt(3 / fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-1] if shape_fan_in_last else shape[0]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class KANLinear(nn.Module):
    """B-spline KAN linear layer.

    out = SiLU(x) @ base_weight.T
        + flatten(B_splines(x)) @ flatten(spline_weight * spline_scaler).T

    Parameter shapes / defaults mirror reference ekan.py:8-77.
    """

    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    enable_standalone_scale_spline: bool = True
    base_activation: Callable[[Array], Array] = jax.nn.silu
    grid_eps: float = 0.02
    grid_range: tuple[float, float] = (-1.0, 1.0)
    fused: bool = False  # dispatch basis+GEMM to the fused Pallas kernel
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None  # e.g. bf16 mixed precision

    def setup(self):
        n_coeff = self.grid_size + self.spline_order
        init_grid = bspline.make_grid(
            self.in_features, self.grid_size, self.spline_order, self.grid_range)
        self.grid = self.variable(
            "buffers", "grid", lambda: init_grid.astype(self.param_dtype))

        self.base_weight = self.param(
            "base_weight",
            kaiming_uniform_init(math.sqrt(5) * self.scale_base),
            (self.out_features, self.in_features),
            self.param_dtype,
        )

        def spline_init(key):
            # reference ekan.py:59-74 — fit random noise with curve2coeff
            noise = (
                (jax.random.uniform(
                    key, (self.grid_size + 1, self.in_features, self.out_features),
                    self.param_dtype) - 0.5)
                * self.scale_noise / self.grid_size
            )
            pts = init_grid.T[self.spline_order:-self.spline_order]
            coeffs = bspline.curve2coeff(pts, noise, init_grid, self.spline_order)
            if not self.enable_standalone_scale_spline:
                coeffs = coeffs * self.scale_spline
            return coeffs.astype(self.param_dtype)

        self.spline_weight = self.param("spline_weight", lambda key, *_: spline_init(key),
                                        (self.out_features, self.in_features, n_coeff))
        if self.enable_standalone_scale_spline:
            self.spline_scaler = self.param(
                "spline_scaler",
                kaiming_uniform_init(math.sqrt(5) * self.scale_spline),
                (self.out_features, self.in_features),
                self.param_dtype,
            )

    @property
    def scaled_spline_weight(self) -> Array:
        if self.enable_standalone_scale_spline:
            return self.spline_weight * self.spline_scaler[..., None]
        return self.spline_weight

    def __call__(self, x: Array, gin_graph=None) -> Array:
        """Standard KANLinear forward; with `gin_graph=(g, eps)` the layer
        computes KANLinear((1+eps)·x_i + Σ_j x_j) over the GraphBatch —
        the GIN conv fusion point (pallas/gin_fused.py: aggregation, the
        (1+eps)x add and the whole transform run in one kernel launch)."""
        orig_shape = x.shape
        x = x.reshape(-1, self.in_features)
        grid = self.grid.value
        cd = self.compute_dtype
        wb, ws = self.base_weight, self.scaled_spline_weight
        if cd is not None:
            x, grid, wb, ws = (x.astype(cd), grid.astype(cd),
                               wb.astype(cd), ws.astype(cd))

        if gin_graph is not None:
            g, eps = gin_graph
            from kagnn_tpu.ops import segment

            fusable = (self.fused and g.senders_perm is not None
                       and x.dtype in (jnp.float32, jnp.bfloat16))
            if fusable:
                from kagnn_tpu.pallas.gin_fused import (gin_kan_fused,
                                                        gin_kan_fused_halo)

                fn = (gin_kan_fused if segment.halo_state() is None
                      else gin_kan_fused_halo)
                out = fn(x, g, eps, grid, wb, ws, self.spline_order)
                return out.reshape(*orig_shape[:-1], self.out_features)
            # unfused fallback (CPU / halo mode): aggregate, then transform
            agg = segment.neighbor_sum(
                x, g, edge_weight=g.edge_mask.astype(x.dtype))
            x = (1.0 + eps) * x + agg

        # expose the transform input for grid adaptation (kan/adapt.py
        # captures these via mutable=["intermediates"]; no-op otherwise) —
        # the reference's update_grid consumes exactly this tensor
        # (ekan.py:270-275 passes the running activation into update_grid)
        self.sow("intermediates", "kan_in", x)

        if self.fused:
            from kagnn_tpu.pallas import bspline_fused

            out = bspline_fused.kan_linear_fused(
                x, grid, wb, ws, self.spline_order)
        else:
            base = self.base_activation(x) @ wb.T
            bases = bspline.b_splines(x, grid, self.spline_order)
            w = ws.reshape(self.out_features, -1)
            out = base + bases.reshape(x.shape[0], -1) @ w.T
        return out.reshape(*orig_shape[:-1], self.out_features)

    def regularization_loss(
        self, regularize_activation: float = 1.0, regularize_entropy: float = 1.0
    ) -> Array:
        """Fake-L1 + entropy regularizer, reference ekan.py:213-233."""
        l1_fake = jnp.abs(self.spline_weight).mean(-1)
        reg_act = l1_fake.sum()
        p = l1_fake / reg_act
        reg_ent = -jnp.sum(p * jnp.log(p))
        return regularize_activation * reg_act + regularize_entropy * reg_ent


class KAN(nn.Module):
    """Stack of KANLinear layers (reference ekan.py:236-281)."""

    layers_hidden: Sequence[int]
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    base_activation: Callable[[Array], Array] = jax.nn.silu
    grid_eps: float = 0.02
    grid_range: tuple[float, float] = (-1.0, 1.0)
    fused: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 train: bool = False, gin_graph=None) -> Array:
        # mask/train accepted (and ignored) for the shared update-net calling
        # convention with MLP (which needs them for masked BatchNorm).
        # gin_graph=(g, eps): fuse the GIN aggregation into the FIRST layer
        # (see KANLinear.__call__ / pallas/gin_fused.py).
        del mask, train
        for i, (fin, fout) in enumerate(
            zip(self.layers_hidden[:-1], self.layers_hidden[1:])
        ):
            x = KANLinear(
                fin, fout,
                grid_size=self.grid_size,
                spline_order=self.spline_order,
                scale_noise=self.scale_noise,
                scale_base=self.scale_base,
                scale_spline=self.scale_spline,
                base_activation=self.base_activation,
                grid_eps=self.grid_eps,
                grid_range=self.grid_range,
                fused=self.fused,
                compute_dtype=self.compute_dtype,
                name=f"layers_{i}",
            )(x, gin_graph=gin_graph if i == 0 else None)
        return x


class FastKANLayer(nn.Module):
    """RBF KAN layer: spline_linear(rbf(layernorm(x))) + base_linear(silu(x)).

    Semantics per reference fastkan.py:49-85; defaults grid [-2, 2] x 8,
    layernorm + base update on.
    """

    input_dim: int
    output_dim: int
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base_update: bool = True
    use_layernorm: bool = True
    base_activation: Callable[[Array], Array] = jax.nn.silu
    spline_weight_init_scale: float = 0.1
    fused: bool = False
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.use_layernorm:
            assert self.input_dim > 1, (
                "Do not use layernorms on 1D inputs. Set use_layernorm=False.")
            self.layernorm = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype)
        self.denominator = (self.grid_max - self.grid_min) / (self.num_grids - 1)
        # spline_linear: bias-free, trunc-normal(std=init_scale) — fastkan.py:22-28
        self.spline_weight = self.param(
            "spline_weight",
            lambda key, shape, dtype: self.spline_weight_init_scale
            * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype),
            (self.output_dim, self.input_dim * self.num_grids),
            self.param_dtype,
        )
        if self.use_base_update:
            # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
            bound = 1.0 / math.sqrt(self.input_dim)
            self.base_weight = self.param(
                "base_weight",
                lambda key, shape, dtype: jax.random.uniform(
                    key, shape, dtype, -bound, bound),
                (self.output_dim, self.input_dim),
                self.param_dtype,
            )
            self.base_bias = self.param(
                "base_bias",
                lambda key, shape, dtype: jax.random.uniform(
                    key, shape, dtype, -bound, bound),
                (self.output_dim,),
                self.param_dtype,
            )

    def __call__(self, x: Array, use_layernorm: bool = True,
                 gin_graph=None) -> Array:
        """Standard FastKANLayer forward; with `gin_graph=(g, eps)` the layer
        computes FastKAN((1+eps)·x_i + Σ_j x_j) over the GraphBatch — the
        GIFASTKAN conv fusion point (pallas/gin_fastkan.py: aggregation,
        the (1+eps)x add, layernorm, RBF and both GEMMs in one launch)."""
        orig_shape = x.shape
        x = x.reshape(-1, self.input_dim)
        cd = self.compute_dtype
        if cd is not None:
            x = x.astype(cd)

        sw = self.spline_weight if cd is None else self.spline_weight.astype(cd)

        if gin_graph is not None:
            g, eps = gin_graph
            from kagnn_tpu.ops import segment

            fusable = (self.fused and self.use_base_update
                       and self.use_layernorm and use_layernorm
                       and g.senders_perm is not None
                       and x.dtype in (jnp.float32, jnp.bfloat16))
            if fusable:
                from kagnn_tpu.pallas.gin_fastkan import (
                    gin_fastkan_fused, gin_fastkan_fused_halo)

                if self.is_initializing():
                    _ = self.layernorm(x)  # materialize the layernorm params
                lng = self.layernorm.variables["params"]["scale"]
                lnb = self.layernorm.variables["params"]["bias"]
                wb, bb = self.base_weight, self.base_bias
                if cd is not None:
                    lng, lnb, wb, bb = (a.astype(cd)
                                        for a in (lng, lnb, wb, bb))
                fn = (gin_fastkan_fused if segment.halo_state() is None
                      else gin_fastkan_fused_halo)
                ret = fn(x, g, eps, lng, lnb, sw, wb, bb, self.grid_min,
                         self.grid_max, self.num_grids, self.denominator)
                return ret.reshape(*orig_shape[:-1], self.output_dim)
            # unfused fallback (CPU / halo mode): aggregate, then transform
            agg = segment.neighbor_sum(
                x, g, edge_weight=g.edge_mask.astype(x.dtype))
            x = (1.0 + eps) * x + agg
        if (self.fused and self.use_base_update
                and self.use_layernorm and use_layernorm):
            # whole layer in one kernel launch (layernorm + RBF + both GEMMs
            # + bias); pallas/fastkan_layer.py
            from kagnn_tpu.pallas import fastkan_layer

            if self.is_initializing():
                _ = self.layernorm(x)  # materialize the layernorm params
            lng = self.layernorm.variables["params"]["scale"]
            lnb = self.layernorm.variables["params"]["bias"]
            wb, bb = self.base_weight, self.base_bias
            if cd is not None:
                lng, lnb, wb, bb = (a.astype(cd) for a in (lng, lnb, wb, bb))
            ret = fastkan_layer.fastkan_layer_fused(
                x, lng, lnb, sw, wb, bb, self.grid_min, self.grid_max,
                self.num_grids, self.denominator)
            return ret.reshape(*orig_shape[:-1], self.output_dim)

        xs = self.layernorm(x) if (self.use_layernorm and use_layernorm) else x
        if self.fused:
            from kagnn_tpu.pallas import rbf_fused

            ret = rbf_fused.fastkan_fused(
                xs, sw, self.grid_min, self.grid_max,
                self.num_grids, self.denominator)
        else:
            grid = rbf.make_rbf_grid(self.grid_min, self.grid_max,
                                     self.num_grids).astype(xs.dtype)
            basis = rbf.rbf_basis(xs, grid, self.denominator)
            ret = basis.reshape(x.shape[0], -1) @ sw.T
        if self.use_base_update:
            wb = self.base_weight if cd is None else self.base_weight.astype(cd)
            bb = self.base_bias if cd is None else self.base_bias.astype(cd)
            ret = ret + self.base_activation(x) @ wb.T + bb
        return ret.reshape(*orig_shape[:-1], self.output_dim)

    def plot_curve(self, input_index: int, output_index: int,
                   num_pts: int = 1000, num_extrapolate_bins: int = 2):
        """Learned univariate curve for one (input, output) pair — reference
        fastkan.py:87-115. Call via module.apply(vars, ..., method=
        FastKANLayer.plot_curve); returns (x, y) arrays, no plotting dep."""
        ng = self.num_grids
        h = self.denominator
        assert input_index < self.input_dim
        assert output_index < self.output_dim
        w = self.spline_weight[output_index,
                               input_index * ng:(input_index + 1) * ng]
        x = jnp.linspace(self.grid_min - num_extrapolate_bins * h,
                         self.grid_max + num_extrapolate_bins * h, num_pts)
        grid = rbf.make_rbf_grid(self.grid_min, self.grid_max, ng)
        y = (w * rbf.rbf_basis(x, grid, h)).sum(-1)
        return x, y


class AttentionWithFastKANTransform(nn.Module):
    """Multi-head attention with FastKAN q/k/v/o/gating projections.

    Parity target: reference fastkan.py:148-202 (defined there but unused by
    any model — included for API-surface completeness). Bias is an additive
    attention bias; gating multiplies the pre-output by sigmoid(g(q)).
    """

    q_dim: int
    k_dim: int
    v_dim: int
    head_dim: int
    num_heads: int
    gating: bool = True

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 bias: Array | None = None) -> Array:
        H, C = self.num_heads, self.head_dim
        total = H * C
        norm = C ** -0.5
        wq = FastKANLayer(self.q_dim, total, name="linear_q")(q)
        wk = FastKANLayer(self.k_dim, total, name="linear_k")(k)
        wv = FastKANLayer(self.v_dim, total, name="linear_v")(v)
        wq = wq.reshape(*q.shape[:-1], 1, H, C) * norm      # *q1hc
        wk = wk.reshape(*k.shape[:-2], 1, k.shape[-2], H, C)  # *1khc
        att = jax.nn.softmax((wq * wk).sum(-1), axis=-2)      # *qkh
        if bias is not None:
            att = att + bias[..., None]
        wv = wv.reshape(*v.shape[:-2], 1, v.shape[-2], H, C)  # *1khc
        o = (att[..., None] * wv).sum(-3)                     # *qhc
        o = o.reshape(*o.shape[:-2], total)
        if self.gating:
            g = FastKANLayer(self.q_dim, total, name="linear_g")(q)
            o = jax.nn.sigmoid(g) * o
        return FastKANLayer(total, self.q_dim, name="linear_o")(o)


class FastKAN(nn.Module):
    """Stack of FastKANLayer (reference fastkan.py:118-145)."""

    layers_hidden: Sequence[int]
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base_update: bool = True
    base_activation: Callable[[Array], Array] = jax.nn.silu
    spline_weight_init_scale: float = 0.1
    fused: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 train: bool = False, gin_graph=None) -> Array:
        # gin_graph=(g, eps): fuse the GIN aggregation into the FIRST layer
        # (see FastKANLayer.__call__ / pallas/gin_fastkan.py).
        del mask, train  # shared update-net calling convention (see KAN)
        for i, (fin, fout) in enumerate(
            zip(self.layers_hidden[:-1], self.layers_hidden[1:])
        ):
            x = FastKANLayer(
                fin, fout,
                grid_min=self.grid_min,
                grid_max=self.grid_max,
                num_grids=self.num_grids,
                use_base_update=self.use_base_update,
                base_activation=self.base_activation,
                spline_weight_init_scale=self.spline_weight_init_scale,
                fused=self.fused,
                compute_dtype=self.compute_dtype,
                name=f"layers_{i}",
            )(x, gin_graph=gin_graph if i == 0 else None)
        return x
