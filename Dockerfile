# Container image for the idto_tpu framework (analog of the reference's
# Dockerfile, which builds on Ubuntu 22.04 + a Drake binary release; this
# build has no Drake dependency -- the physics substrate is the in-tree
# JAX multibody engine).
#
#   docker build -t idto-tpu .
#   docker run --rm idto-tpu python -m idto_tpu.examples.run spinner --test
#
# On Cloud TPU VMs, swap the base/jax install for the libtpu wheel:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
FROM python:3.11-slim

# g++ for the lazily-compiled native host runtime (native/*.cc are bundled
# in the wheel and built on first use via ctypes; idto_tpu/native/__init__.py).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/idto_tpu
COPY pyproject.toml README.md ./
COPY idto_tpu ./idto_tpu
COPY native ./native
COPY tests ./tests

RUN pip install --no-cache-dir -e '.[test]'

# Smoke check at build time: parse every bundled asset and load a model.
RUN python -c "import idto_tpu; from idto_tpu.examples.registry import example_names; print(example_names())"

CMD ["python", "-m", "idto_tpu.examples.run", "--list"]
