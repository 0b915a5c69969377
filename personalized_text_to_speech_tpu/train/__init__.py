"""Training runtime: losses, train states, the fused GAN step, and the loop."""
