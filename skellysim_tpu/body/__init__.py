from skellysim_tpu.body.container import BodyContainer  # noqa: F401
from skellysim_tpu.body.rigid import RigidBody, RigidBodyState  # noqa: F401
