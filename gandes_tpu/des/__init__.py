from gandes_tpu.des.engine import (
    Event,
    EventList,
    FlowBranchOperator,
    Queue,
    Server,
    Sim,
    SimBudgetExceeded,
    Source,
)
from gandes_tpu.des.theory import (
    calculate_theoretical_renege_rate,
    mm1_lq,
    mm1_wq,
    md1_lq,
    md1_wq,
    mm1_pk,
)


def __getattr__(name):
    # lazy: SimTester pulls matplotlib+scipy (~4 s import, Agg side
    # effect); plain Sim users must not pay for it
    if name == "SimTester":
        from gandes_tpu.des.tester import SimTester

        return SimTester
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
