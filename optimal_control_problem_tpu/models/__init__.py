"""Model library — the BASELINE.json config set as OCP builders
(SURVEY.md section 7, layer 6)."""

from . import cartpole, double_integrator, quadrotor, unicycle
from .cartpole import CartPoleOCP
from .double_integrator import DoubleIntegratorOCP
from .quadrotor import QuadrotorOCP
from .unicycle import UnicycleOCP

__all__ = [
    "cartpole",
    "double_integrator",
    "quadrotor",
    "unicycle",
    "CartPoleOCP",
    "DoubleIntegratorOCP",
    "QuadrotorOCP",
    "UnicycleOCP",
]
