"""Props (reference: dm_control/entities/props/)."""
