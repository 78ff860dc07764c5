from setuptools import setup, find_packages

setup(
    name="mfx",
    version="0.1.0",
    description="TPU-native matrix factorization training framework (JAX/Pallas)",
    packages=find_packages(include=["mfx", "mfx.*"]),
    python_requires=">=3.10",
)
