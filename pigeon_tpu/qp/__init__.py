from pigeon_tpu.qp import structure, coupled, decoupled
