from rt_tpu.scene.types import SceneDef, SceneTables, CameraDef, build_tables  # noqa: F401
from rt_tpu.scene.parser import parse_scene, parse_scene_dict, scene_to_dict  # noqa: F401
