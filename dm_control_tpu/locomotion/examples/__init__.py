"""Locomotion library (reference: dm_control/locomotion/)."""
