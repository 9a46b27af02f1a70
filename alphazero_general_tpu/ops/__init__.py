"""TPU kernels (Pallas) and the native C++ host runtime binding."""
