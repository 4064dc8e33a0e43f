"""On-device PPO learner (the reference has no training loop; SURVEY §2.16)."""
from dtown.learn.ppo import PPOConfig, TrainState, make_ppo  # noqa: F401
from dtown.learn.networks import ActorCritic  # noqa: F401
