from .build import build_device_scene, load_scene  # noqa: F401
from .camera import Camera, make_camera  # noqa: F401
from .device_scene import DeviceScene  # noqa: F401
from .parser import SceneDesc, parse_scene  # noqa: F401
