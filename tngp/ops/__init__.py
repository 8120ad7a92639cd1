"""Pure-jnp golden numerics for the framework (and the test oracles).

Every hot op here has (or will have) a Pallas twin in `tngp.kernels` with the
same signature; tests cross-check the two.
"""

from .activation import trunc_exp
from .composite import composite_rays, composite_rays_flat
from .freq import freq_encode, freq_output_dim
from .grid_utils import bitfield_probe, morton3d, morton3d_invert, packbits
from .hashgrid import HashGridSpec, hash_encode, hash_encode_tv_grad
from .losses import eff_distloss, huber_loss, mape_loss
from .march import (
    ChunkedMarch,
    MarchResult,
    StreamMarch,
    grid_cell_index,
    ladder_samples,
    march_rays,
    march_rays_chunked,
    march_rays_dense,
    march_rays_stream,
    mip_level,
)
from .rays import near_far_from_aabb, sph_from_ray
from .sampling import sample_pdf
from .sh import sh_encode

__all__ = [
    "trunc_exp",
    "composite_rays",
    "composite_rays_flat",
    "freq_encode",
    "freq_output_dim",
    "bitfield_probe",
    "morton3d",
    "morton3d_invert",
    "packbits",
    "HashGridSpec",
    "hash_encode",
    "hash_encode_tv_grad",
    "eff_distloss",
    "huber_loss",
    "mape_loss",
    "MarchResult",
    "grid_cell_index",
    "march_rays",
    "march_rays_dense",
    "march_rays_stream",
    "march_rays_chunked",
    "ladder_samples",
    "StreamMarch",
    "ChunkedMarch",
    "mip_level",
    "near_far_from_aabb",
    "sph_from_ray",
    "sample_pdf",
    "sh_encode",
]
