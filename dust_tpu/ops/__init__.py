"""The compute path: traversal, lighting, GI cache, sampling, post.

Each module documents the reference GLSL/Rust it re-implements
(``/root/reference/assets/shaders/**``, SURVEY §2.7). Everything is
shape-static, jit-compatible jax.numpy; hot kernels optionally have
Pallas variants.
"""
