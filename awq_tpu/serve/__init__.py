from awq_tpu.serve.controller import Controller, DispatchMethod  # noqa: F401
from awq_tpu.serve.worker import ModelWorker  # noqa: F401
