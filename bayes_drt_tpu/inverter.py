"""Placeholder; full Inverter API lands with the solver stack."""


class Inverter:  # pragma: no cover - replaced in a later milestone
    pass
