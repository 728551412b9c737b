from rtxpt_tpu.scene.scene import (
    Geometry, Materials, AnalyticLights, SceneData, MeshInstance, HostScene,
    LIGHT_POINT, LIGHT_DIRECTIONAL, LIGHT_SPOT,
)
from rtxpt_tpu.scene.camera import Camera, camera_ray, look_at
