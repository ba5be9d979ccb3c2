# Full image: converters + quantize + all CLIs (the reference's full.Dockerfile).
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ make && \
    rm -rf /var/lib/apt/lists/*
WORKDIR /app
RUN pip install --no-cache-dir "jax[cpu]" numpy torch --index-url https://download.pytorch.org/whl/cpu
COPY . .
RUN make -C native
ENV PYTHONPATH=/app
ENTRYPOINT ["/app/.devops/tools.sh"]
