from gandes_tpu.eval.visualize import (
    plot_input_matrix,
    simulation_log_to_gif,
    visualize_piano_roll,
    plot_spectrogram,
)
