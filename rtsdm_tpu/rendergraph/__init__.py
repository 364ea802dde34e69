from .render_pass import RenderPass, PassReflection, RenderContext, register_pass, create_pass, PASS_REGISTRY
from .graph import RenderGraph
