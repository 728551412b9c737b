from rtxpt_tpu.lighting.envmap import EnvMap, bake_envmap, env_eval, env_pdf, env_sample
from rtxpt_tpu.lighting.lights_baker import (
    LightList, bake_lights, sample_light, light_pdf_for_tri_hit,
)
