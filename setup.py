from setuptools import setup, find_packages

setup(
    name="ttc",
    version="0.1.0",
    description="TPU-native tropical tree cover mapping framework",
    packages=find_packages(include=["ttc", "ttc.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "scipy",
    ],
)
