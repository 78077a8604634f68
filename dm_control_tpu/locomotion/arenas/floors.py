"""Floor arena (reference: dm_control/locomotion/arenas/floors.py:26)."""

from __future__ import annotations

from dm_control_tpu.composer.arena import Arena


class Floor(Arena):
    """A flat plane with aligned world axes."""

    def _build(self, size=(8, 8), name="floor"):
        super()._build(name=name)
        self._size = size
        wb = self._mjcf_root.first("worldbody")
        self._ground_geom = wb.add(
            "geom", name="groundplane", type="plane",
            size=f"{size[0]} {size[1]} 0.25")  # default friction, like the
        # reference groundplane (floors.py:77-82 sets no friction attr)

    @property
    def ground_geoms(self):
        return (self._ground_geom,)

    @property
    def size(self):
        return self._size
