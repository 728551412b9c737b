from rtxpt_tpu.accel.bvh import ThreadedBVH
from rtxpt_tpu.accel.lbvh import build_bvh
from rtxpt_tpu.accel.traverse import intersect_closest, intersect_any, Hit
