"""Manipulators (reference: dm_control/entities/manipulators/)."""
