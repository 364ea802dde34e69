"""Render-pass library (reference Source/RenderPasses/ — 70 plugin dirs).

Importing this package registers every pass type with the plugin registry,
the moral equivalent of Falcor loading pass DLLs at startup.
"""
from . import gbuffer          # noqa: F401
from . import depth_chain      # noqa: F401
from . import interleave       # noqa: F401
from . import hbao             # noqa: F401
from . import blur             # noqa: F401
from . import lighting         # noqa: F401
from . import tonemap          # noqa: F401
from . import image_equation   # noqa: F401
from . import stochastic_depth # noqa: F401
from . import svao             # noqa: F401
from . import temporal         # noqa: F401
from . import ao_extra         # noqa: F401
from . import pipeline_misc    # noqa: F401
from . import measure          # noqa: F401
from . import gbuffer_rt       # noqa: F401
from . import stubs            # noqa: F401
from . import ml               # noqa: F401
from . import debug            # noqa: F401
from . import path_tracer      # noqa: F401
from . import postfx           # noqa: F401
from . import whitted          # noqa: F401
from . import svgf             # noqa: F401
from . import nrd              # noqa: F401
from . import rtxdi            # noqa: F401
from . import bsdf_viewer      # noqa: F401
from . import sdf_editor       # noqa: F401
from . import comparison       # noqa: F401
from . import test_passes      # noqa: F401
