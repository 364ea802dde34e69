from .tiles import make_band_renderer, band_mesh
