from .colorcodec import distinct_colors, idx2color, image_color2idx, image_int2color
