"""crnn_tpu.ode — adaptive ODE solver suite (fixed-shape, jit/vmap/grad-safe).

Replaces the reference's DifferentialEquations.jl usage:
  Tsit5              <- Tsit5()                      (case1/case1.jl:27)
  Rosenbrock23       <- Rosenbrock23(autodiff=true)  (robertson/rober_crnn.jl:33)
  TRBDF2 / Kvaerno3  <- TRBDF2(autodiff=true)        (Cathode/src/network.jl:102)
  AutoSwitch         <- AutoTsit5(stiff_alg)         (case2/case2.jl:26)
  odesolve           <- solve(prob, alg, saveat=..., atol=..., rtol=...)
"""

from crnn_tpu.ode.base import RHS, Solver, StepResult  # noqa: F401
from crnn_tpu.ode.tsit5 import Tsit5  # noqa: F401
from crnn_tpu.ode.rosenbrock import Rosenbrock23  # noqa: F401
from crnn_tpu.ode.sdirk import ESDIRK, TRBDF2, Kvaerno3  # noqa: F401
from crnn_tpu.ode.autoswitch import AutoSwitch  # noqa: F401
from crnn_tpu.ode.solve import ODESolution, odesolve  # noqa: F401
from crnn_tpu.ode.controller import error_norm, initial_step, propose_dt  # noqa: F401

SOLVER_REGISTRY = {
    "tsit5": Tsit5,
    "rosenbrock23": Rosenbrock23,
    "trbdf2": TRBDF2,
    "kvaerno3": Kvaerno3,
    "auto_tsit5_rosenbrock23": lambda: AutoSwitch(Tsit5(), Rosenbrock23()),
    "auto_tsit5_trbdf2": lambda: AutoSwitch(Tsit5(), TRBDF2()),
}


def get_solver(name: str) -> Solver:
    """Build a solver by registry name (config-file entry point)."""
    try:
        return SOLVER_REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown solver {name!r}; available: {sorted(SOLVER_REGISTRY)}"
        ) from None
