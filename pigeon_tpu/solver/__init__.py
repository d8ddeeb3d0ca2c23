from pigeon_tpu.solver import admm
from pigeon_tpu.solver.admm import QPData, QPSolution, QPWarmStart, solve_qp
