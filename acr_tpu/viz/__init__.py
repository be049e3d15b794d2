from acr_tpu.viz.raster import render_hands
