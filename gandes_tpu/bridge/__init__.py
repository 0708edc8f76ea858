from gandes_tpu.bridge.mmgan_decode import matrix_to_midi, run_simulation
from gandes_tpu.bridge.gandes_decode import matrix_to_wav
from gandes_tpu.bridge.sim_demo import sim_to_wav
