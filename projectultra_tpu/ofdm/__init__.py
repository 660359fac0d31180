"""OFDM PHY: carriers, constellations, modulator, demodulator, pipeline."""
