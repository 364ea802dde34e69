from .camera import Camera
from .scene import Scene
