from rtxpt_tpu.parallel.mesh import (
    make_mesh, render_sample_sharded, render_spp_sharded,
)
