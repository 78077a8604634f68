"""RL environment core (reference: dm_control/rl/control.py)."""
