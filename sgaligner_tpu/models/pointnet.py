"""PointNet object encoder (flax.linen).

TPU-native equivalent of the reference's PointNetfeat
(/root/reference/src/aligner/networks/pointnet.py:87-175) as instantiated by the
aligner: ``global_feat=True, input_transform=False, feature_transform=False,
out_size=256`` (sg_aligner.py:58). Conv1d(k=1) stacks are per-point Dense layers —
pure matmuls that XLA tiles onto the MXU; inputs are channel-last ``[O, P, 3]``.

Quirk policy (SURVEY §7): the reference *calls BatchNorm but discards its output*
(``self.bn1(x)`` unassigned, pointnet.py:141-159), so the effective network is
conv→relu ×3 → max-pool. ``bn_mode="parity"`` replicates that (no BN at all, the
checkpoint-compatible default); ``bn_mode="active"`` applies real BN.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvParams(nn.Module):
    """Parameter container matching nn.Dense's {kernel, bias} tree."""

    din: int
    dout: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_normal(),
                       (self.din, self.dout), self.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.dout,), self.dtype)
        return k, b


class PointNetEncoder(nn.Module):
    out_size: int = 256
    bn_mode: str = "parity"  # "parity" | "active"
    dtype: jnp.dtype = jnp.float32
    # use the fused Pallas kernel (ops/pointnet_fused.py) on TPU in parity
    # mode — same math, activations stay in VMEM. "auto" keys off the default
    # backend; pass "never" when running on devices that differ from the
    # default backend (e.g. a virtual CPU mesh on a TPU box — the factory
    # resolves this from the mesh platform).
    fused: str = "auto"  # "auto" | "never" | "always"

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """points: [O, P, 3] -> [O, out_size]."""
        x = points.astype(self.dtype)

        from sgaligner_tpu.ops import kernel_mode

        if kernel_mode.use_fused(self.fused) and self.bn_mode == "parity":
            from sgaligner_tpu.ops.pointnet_fused import pointnet_fused

            # same param tree as the Dense path: {convN: {kernel, bias}}
            (w1, b1) = _ConvParams(3, 64, self.dtype, name="conv1")()
            (w2, b2) = _ConvParams(64, 128, self.dtype, name="conv2")()
            (w3, b3) = _ConvParams(128, self.out_size, self.dtype,
                                   name="conv3")()
            # points are data: the fused op returns a zero x-cotangent
            return pointnet_fused(jax.lax.stop_gradient(x), w1, b1[None],
                                  w2, b2[None], w3, b3[None],
                                  kernel_mode.interpret())
        x = jnp.swapaxes(x, 1, 2)  # XLA path computes points-last

        def block(x, feats, name):
            x = nn.Dense(feats, name=name, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_normal())(x)
            if self.bn_mode == "active":
                x = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn",
                                 dtype=self.dtype)(x)
            return nn.relu(x)

        x = block(x, 64, "conv1")
        x = block(x, 128, "conv2")
        x = block(x, self.out_size, "conv3")
        return jnp.max(x, axis=1)  # global max-pool over points


class STN(nn.Module):
    """Spatial/feature transform net — STN3d/STNkd (pointnet.py:14-85).

    Unused by the aligner's instantiation (input_transform=False,
    sg_aligner.py:58) but part of the reference PointNet family: predicts a
    [k, k] transform from the point set, initialized around identity.
    """

    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """points: [O, P, k] -> [O, k, k]."""
        x = points.astype(self.dtype)
        for feats, name in ((64, "conv1"), (128, "conv2"), (1024, "conv3")):
            x = nn.Dense(feats, name=name, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"{name}_bn", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=1)
        for feats, name in ((512, "fc1"), (256, "fc2")):
            x = nn.Dense(feats, name=name, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"{name}_bn", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(self.k * self.k, name="fc3", dtype=self.dtype,
                     kernel_init=nn.initializers.zeros)(x)
        eye = jnp.eye(self.k, dtype=self.dtype).reshape(-1)
        return (x + eye).reshape(-1, self.k, self.k)


class PointNetCls(nn.Module):
    """Classifier head — PointNetCls (pointnet.py:178-213): fc 512 -> 256 -> k
    with BN + dropout, log-softmax output."""

    k: int = 2
    batch_norm: bool = True
    drop_out: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(512, name="fc1", dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn1",
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2", dtype=self.dtype)(x)
        if self.drop_out:
            x = nn.Dropout(0.3, deterministic=not train)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn2",
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.k, name="fc3", dtype=self.dtype)(x)
        return nn.log_softmax(x, axis=1)


class PointNetRelClsMulti(nn.Module):
    """Multi-label relation head — PointNetRelClsMulti (pointnet.py:267-303):
    same MLP with a sigmoid output."""

    k: int = 2
    batch_norm: bool = True
    drop_out: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(512, name="fc1", dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn1",
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2", dtype=self.dtype)(x)
        if self.drop_out:
            x = nn.Dropout(0.3, deterministic=not train)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn2",
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.k, name="fc3", dtype=self.dtype)(x)
        return nn.sigmoid(x)


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """||T Tᵀ - I||_F regularizer (pointnet.py:321-328)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)[None]
    diff = jnp.einsum("bij,bkj->bik", trans, trans) - eye
    return jnp.mean(jnp.linalg.norm(diff, axis=(1, 2)))
