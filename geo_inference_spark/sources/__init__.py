from .pages import (  # noqa: F401
    admin_grid_polygons,
    admin_polygons_df,
    extract_text_bytes,
    pages_df,
    synth_admin_polygons,
)
