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
from gandes_tpu.des.tester import SimTester
from gandes_tpu.des.theory import (
    calculate_theoretical_renege_rate,
    mm1_lq,
    mm1_wq,
    md1_lq,
    md1_wq,
    mm1_pk,
)
