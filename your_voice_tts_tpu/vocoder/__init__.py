"""Neural vocoders (reference vocoder/ subpackage; SURVEY.md SS2.1):
MelGAN-family GANs and WaveRNN with batched sequence folding."""
