"""Cross-framework numerics parity vs pure-PyTorch reimplementations.

The BASELINE.md gate: pixel/parameter grads allclose between this framework
and reference-semantics implementations written independently in torch
(behavioral specs: gridencoder/src/gridencoder.cu get_grid_index/kernel_grid,
testing/test_shencoder.py:8-50 SH oracle, nerf/renderer.py:126-254 `run` path).
Torch here is the CPU build; everything runs in float32 with documented
tolerances.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tngp.ops.hashgrid import HashGridSpec, hash_encode, hash_encode_cf_vjp
from tngp.ops.sh import sh_encode_cf

_PRIMES = (1, 2654435761, 805459861)
_M32 = (1 << 32) - 1


# --------------------------------------------------------------------- helpers
def torch_hash_encode(x: torch.Tensor, table: torch.Tensor, spec: HashGridSpec):
    """Pure-torch multiresolution grid encode with uint32-emulated index math
    (gridencoder.cu:67-84,137-177 semantics; int64 ops masked to 32 bits)."""
    B = x.shape[0]
    D = spec.input_dim
    L, C = spec.num_levels, spec.level_dim
    offsets = spec.offsets
    outs = []
    for level in range(L):
        hashmap_size = offsets[level + 1] - offsets[level]
        scale = spec.level_scale(level)
        res = spec.level_resolution(level)
        side = res if spec.align_corners else res + 1
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift
        pos_grid = torch.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = pos_grid.to(torch.int64)
        level_out = torch.zeros(B, C, dtype=table.dtype)
        for corner in range(1 << D):
            cc = [pg[:, d] + ((corner >> d) & 1) for d in range(D)]
            # dense strided index while stride fits, else spatial hash
            index = torch.zeros(B, dtype=torch.int64)
            stride = 1
            for d in range(D):
                if stride > hashmap_size:
                    break
                index = (index + (cc[d] & _M32) * (stride & _M32)) & _M32
                stride *= side
            if spec.gridtype == "hash" and stride > hashmap_size:
                h = torch.zeros(B, dtype=torch.int64)
                for d in range(D):
                    h = h ^ ((cc[d] * _PRIMES[d]) & _M32)
                index = h & _M32
            rows = index % hashmap_size + offsets[level]
            w = torch.ones(B, dtype=table.dtype)
            for d in range(D):
                fd = frac[:, d].to(table.dtype)
                w = w * (fd if (corner >> d) & 1 else 1.0 - fd)
            level_out = level_out + w[:, None] * table[rows]
        outs.append(level_out)
    out = torch.stack(outs, dim=1).reshape(B, L * C)  # level-major like grid.py:59-69
    oob = ((x < 0) | (x > 1)).any(dim=1)
    return torch.where(oob[:, None], torch.zeros_like(out), out)


def _spec(gridtype="hash"):
    return HashGridSpec.create(
        num_levels=6, level_dim=2, base_resolution=4, log2_hashmap_size=7,
        desired_resolution=64, gridtype=gridtype,
    )


# ----------------------------------------------------------------- hash encode
@pytest.mark.parametrize("gridtype", ["hash", "tiled"])
def test_hash_encode_forward_vs_torch(gridtype):
    spec = _spec(gridtype)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.02, 0.98, (256, 3)).astype(np.float32)
    table = rng.normal(0, 0.1, (spec.total_params, spec.level_dim)).astype(np.float32)

    ours = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table), spec))
    theirs = torch_hash_encode(torch.from_numpy(x), torch.from_numpy(table), spec).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("gridtype", ["hash", "tiled"])
def test_hash_encode_table_grad_vs_torch(gridtype):
    spec = _spec(gridtype)
    rng = np.random.default_rng(1)
    x = rng.uniform(0.02, 0.98, (128, 3)).astype(np.float32)
    table = rng.normal(0, 0.1, (spec.total_params, spec.level_dim)).astype(np.float32)
    cot = rng.normal(0, 1, (128, spec.output_dim)).astype(np.float32)

    # ours: custom-VJP channels-first path
    def f(tbl):
        out = hash_encode_cf_vjp(jnp.asarray(x).T, tbl, spec)  # [L*C, B]
        return jnp.sum(out * jnp.asarray(cot).T)

    g_ours = np.asarray(jax.grad(f)(jnp.asarray(table)))

    tt = torch.from_numpy(table.copy()).requires_grad_(True)
    out = torch_hash_encode(torch.from_numpy(x), tt, spec)
    (out * torch.from_numpy(cot)).sum().backward()
    np.testing.assert_allclose(g_ours, tt.grad.numpy(), atol=5e-5, rtol=1e-4)


def test_hash_encode_input_grad_vs_torch():
    spec = _spec("hash")
    rng = np.random.default_rng(2)
    x = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
    table = rng.normal(0, 0.1, (spec.total_params, spec.level_dim)).astype(np.float32)
    cot = rng.normal(0, 1, (64, spec.output_dim)).astype(np.float32)

    def f(xc):
        out = hash_encode_cf_vjp(xc, jnp.asarray(table), spec)
        return jnp.sum(out * jnp.asarray(cot).T)

    g_ours = np.asarray(jax.grad(f)(jnp.asarray(x).T)).T  # [B, 3]

    xt = torch.from_numpy(x.copy()).requires_grad_(True)
    out = torch_hash_encode(xt, torch.from_numpy(table), spec)
    (out * torch.from_numpy(cot)).sum().backward()
    np.testing.assert_allclose(g_ours, xt.grad.numpy(), atol=2e-3, rtol=2e-3)


# -------------------------------------------------------------------------- SH
def torch_sh_oracle(d: torch.Tensor, degree: int) -> torch.Tensor:
    """Associated-Legendre-recurrence SH oracle in float64 torch (independent
    of the jnp implementation's Cartesian generation; reference oracle
    testing/test_shencoder.py:8-50)."""
    import math

    x, y, z = (d[:, i].to(torch.float64) for i in range(3))
    B = d.shape[0]
    # azimuthal parts: C_m + i S_m = (x + iy)^m
    Cm = [torch.ones(B, dtype=torch.float64)]
    Sm = [torch.zeros(B, dtype=torch.float64)]
    for m in range(1, degree):
        Cm.append(Cm[-1] * x - Sm[-1] * y)
        Sm.append(Sm[-1] * x + Cm[-2] * y)
    out = torch.zeros(B, degree * degree, dtype=torch.float64)
    for m in range(degree):
        # Pbar with sin^m folded: Pb_m^m = (-1)^m (2m-1)!!
        pmm = ((-1.0) ** m) * float(np.prod(np.arange(1, 2 * m, 2))) if m > 0 else 1.0
        P = [torch.full((B,), pmm, dtype=torch.float64)]
        if m + 1 < degree:
            P.append((2 * m + 1) * z * P[0])
        for l in range(m + 2, degree):
            P.append(((2 * l - 1) * z * P[-1] - (l + m - 1) * P[-2]) / (l - m))
        for i, l in enumerate(range(m, degree)):
            K = math.sqrt(
                (2 * l + 1) / (4 * math.pi)
                * math.factorial(l - m) / math.factorial(l + m)
            )
            if m == 0:
                out[:, l * l + l] = K * P[i]
            else:
                out[:, l * l + l + m] = math.sqrt(2.0) * K * Cm[m] * P[i]
                out[:, l * l + l - m] = math.sqrt(2.0) * K * Sm[m] * P[i]
    return out


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 6, 8])
def test_sh_vs_torch_oracle(degree):
    rng = np.random.default_rng(3)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ours = np.asarray(sh_encode_cf(jnp.asarray(d).T, degree)).T
    theirs = torch_sh_oracle(torch.from_numpy(d), degree).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------------ compositing
def test_composite_fwd_bwd_vs_torch():
    """Slab compositing (exp-cumsum form) vs the reference run()-style
    cumprod-of-(1-alpha) form in torch, fwd + grads wrt sigmas
    (nerf/renderer.py:219-230; raymarching.cu:500-577 closed form)."""
    from tngp.ops.composite import composite_rays

    rng = np.random.default_rng(4)
    N, K = 32, 24
    sig = rng.uniform(0, 12, (N, K)).astype(np.float32)
    rgb = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    dts = rng.uniform(0.005, 0.03, (N, K)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) < 0.8
    # make masks prefix-contiguous like real marched slabs
    mask = np.sort(mask, axis=1)[:, ::-1].copy()
    cot_img = rng.normal(size=(N, 3)).astype(np.float32)

    def ours(s):
        ws, depth, image, w = composite_rays(
            s, jnp.asarray(rgb), jnp.asarray(dts), jnp.asarray(dts),
            jnp.asarray(mask), T_thresh=0.0,
        )
        return jnp.sum(image * jnp.asarray(cot_img)), (ws, image)

    (loss, (ws_o, img_o)), g_ours = jax.value_and_grad(ours, has_aux=True)(
        jnp.asarray(sig)
    )

    st = torch.from_numpy(sig.copy()).requires_grad_(True)
    m = torch.from_numpy(mask.astype(np.float32))
    tau = st * torch.from_numpy(dts) * m
    alpha = 1.0 - torch.exp(-tau)
    shifted = torch.cat([torch.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-15], dim=1)
    w = alpha * torch.cumprod(shifted, dim=1)[:, :-1] * m
    img_t = torch.einsum("nk,nkc->nc", w, torch.from_numpy(rgb))
    (img_t * torch.from_numpy(cot_img)).sum().backward()

    np.testing.assert_allclose(np.asarray(img_o), img_t.detach().numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours), st.grad.numpy(),
                               atol=2e-4, rtol=2e-3)


# ----------------------------------------------- end-to-end uniform render path
class _TinyField:
    """Shared-weight toy field: sigma = trunc_exp(w2 @ relu(w1 @ x)),
    rgb = sigmoid(w3 @ relu(w1 @ x)); evaluated in both frameworks."""

    def __init__(self, seed=5):
        rng = np.random.default_rng(seed)
        self.w1 = rng.normal(0, 0.5, (3, 16)).astype(np.float32)
        self.w2 = rng.normal(0, 0.5, (16, 1)).astype(np.float32)
        self.w3 = rng.normal(0, 0.5, (16, 3)).astype(np.float32)

    def params_jax(self):
        return {"w1": jnp.asarray(self.w1), "w2": jnp.asarray(self.w2),
                "w3": jnp.asarray(self.w3)}

    @staticmethod
    def field_fns():
        from tngp.render import FieldFns

        def density(p, x_cf):
            h = jax.nn.relu(p["w1"].T @ x_cf)
            return jnp.exp(jnp.clip(p["w2"].T @ h, -15, 15))[0]

        def sigma_rgb(p, x_cf, d_cf):
            h = jax.nn.relu(p["w1"].T @ x_cf)
            sigma = jnp.exp(jnp.clip(p["w2"].T @ h, -15, 15))[0]
            rgb = jax.nn.sigmoid(p["w3"].T @ h)
            return sigma, rgb

        return FieldFns(sigma_rgb=sigma_rgb, density=density)

    def torch_eval(self, pts):  # pts [M, 3]
        h = torch.relu(pts @ self.tw1)
        sigma = torch.exp(torch.clamp(h @ self.tw2, -15, 15))[:, 0]
        rgb = torch.sigmoid(h @ self.tw3)
        return sigma, rgb

    def torch_params(self):
        self.tw1 = torch.from_numpy(self.w1.copy()).requires_grad_(True)
        self.tw2 = torch.from_numpy(self.w2.copy()).requires_grad_(True)
        self.tw3 = torch.from_numpy(self.w3.copy()).requires_grad_(True)
        return [self.tw1, self.tw2, self.tw3]


def test_uniform_render_path_vs_torch():
    """Deterministic uniform+importance path: pixel values AND parameter grads
    allclose vs a from-spec torch replica of nerf/renderer.py:126-254."""
    from tngp.render import RenderConfig, render_rays_uniform

    field = _TinyField()
    cfg = RenderConfig(bound=1.0, min_near=0.05)
    N, S, U = 16, 16, 16
    rng = np.random.default_rng(6)
    rays_o = np.zeros((N, 3), np.float32)
    rays_o[:, 2] = -2.5
    d = rng.normal(0, 0.08, (N, 3)).astype(np.float32)
    d[:, 2] += 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    cot = rng.normal(size=(N, 3)).astype(np.float32)

    def ours(p):
        out = render_rays_uniform(
            field.field_fns(), p, jnp.asarray(rays_o), jnp.asarray(d), cfg,
            num_steps=S, upsample_steps=U, key=None, bg_color=None,
        )
        return jnp.sum(out["image"] * jnp.asarray(cot)), out["image"]

    (_, img_o), g_ours = jax.value_and_grad(ours, has_aux=True)(field.params_jax())

    # ---- torch replica (from the reference `run` spec) ----
    to = torch.from_numpy(rays_o)
    td = torch.from_numpy(d)
    field.torch_params()
    # near/far from aabb (slab method), min_near clamp
    inv = 1.0 / td
    t0 = (-1.0 - to) * inv
    t1 = (1.0 - to) * inv
    tmin = torch.minimum(t0, t1).amax(dim=1)
    tmax = torch.maximum(t0, t1).amin(dim=1)
    nears = torch.clamp(tmin, min=cfg.min_near)
    fars = tmax
    z = torch.linspace(0.0, 1.0, S)
    z_vals = nears[:, None] + (fars - nears)[:, None] * z[None, :]
    sample_dist = (fars - nears) / S

    def composite(zv):
        pts = to[:, None, :] + td[:, None, :] * zv[:, :, None]
        pts = torch.clamp(pts, -1.0, 1.0)
        sig, rgb = field.torch_eval(pts.reshape(-1, 3))
        sig = sig.reshape(zv.shape)
        rgb = rgb.reshape(*zv.shape, 3)
        deltas = torch.cat([zv[:, 1:] - zv[:, :-1], sample_dist[:, None]], dim=1)
        alpha = 1.0 - torch.exp(-deltas * sig)
        shifted = torch.cat([torch.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-15], dim=1)
        w = alpha * torch.cumprod(shifted, dim=1)[:, :-1]
        return w, rgb

    with torch.no_grad():
        w, _ = composite(z_vals)
        # sample_pdf (det) on interior weights, renderer.py:36-46
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        wts = w[:, 1:-1] + 1e-5
        pdf = wts / wts.sum(dim=1, keepdim=True)
        cdf = torch.cumsum(pdf, dim=1)
        cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], dim=1)
        u = torch.linspace(0.5 / U, 1.0 - 0.5 / U, U).expand(N, U).contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.clamp(inds - 1, min=0)
        above = torch.clamp(inds, max=cdf.shape[1] - 1)
        cdf_b = torch.gather(cdf, 1, below)
        cdf_a = torch.gather(cdf, 1, above)
        bins_b = torch.gather(z_mid, 1, torch.clamp(below, max=z_mid.shape[1] - 1))
        bins_a = torch.gather(z_mid, 1, torch.clamp(above, max=z_mid.shape[1] - 1))
        denom = torch.where(cdf_a - cdf_b < 1e-5, torch.ones_like(cdf_b), cdf_a - cdf_b)
        new_z = bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
    z_all, _ = torch.sort(torch.cat([z_vals, new_z], dim=1), dim=1)
    w, rgb = composite(z_all)
    img_t = torch.einsum("nk,nkc->nc", w, rgb) + (1.0 - w.sum(dim=1))[:, None] * 1.0
    (img_t * torch.from_numpy(cot)).sum().backward()

    np.testing.assert_allclose(np.asarray(img_o), img_t.detach().numpy(),
                               atol=5e-5, rtol=5e-4)
    for name, gj, tt in (("w1", g_ours["w1"], field.tw1),
                         ("w2", g_ours["w2"], field.tw2),
                         ("w3", g_ours["w3"], field.tw3)):
        np.testing.assert_allclose(
            np.asarray(gj), tt.grad.numpy(), atol=3e-4, rtol=3e-3,
            err_msg=f"param grad mismatch: {name}",
        )
