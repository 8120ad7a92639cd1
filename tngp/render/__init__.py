from .occupancy import (
    OccupancyGrid,
    TimeOccupancyGrid,
    create,
    create_time,
    mark_untrained_grid,
    time_slice_index,
    update_density_grid,
    update_time_density_grid,
)
from .renderer import (
    FieldFns,
    RenderConfig,
    dilated_chunk_grid,
    render_rays_eval,
    render_rays_train,
    render_rays_uniform,
)

__all__ = [
    "OccupancyGrid",
    "TimeOccupancyGrid",
    "create_time",
    "time_slice_index",
    "update_time_density_grid",
    "create",
    "mark_untrained_grid",
    "update_density_grid",
    "FieldFns",
    "RenderConfig",
    "dilated_chunk_grid",
    "render_rays_eval",
    "render_rays_train",
    "render_rays_uniform",
]
