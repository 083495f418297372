from .executor import (CallbackFuture, ComposeFuture, EmptyFuture, Future,
                       InstructionExecutor)
from .isa import (EmptyInstruction, EPMigrate, Fill, ImageEmbed,
                  ImageEmbedFill, Instruction, InstructionList,
                  InstructionListBuilder, MigrateRequest, PDMigrate,
                  PullCache, TextFill)
from .metric import RequestMetric, log_latency_breakdown
from .output_token_processor import (CallbackOutputTokenProcessor,
                                     LogOutputTokenProcessor,
                                     OfflineOutputTokenProcessor,
                                     OutputTokenParams, OutputTokenProcessor,
                                     PrintOutputTokenProcessor,
                                     PrintTextOutputTokenProcessor,
                                     ZmqOutputTokenProcessor)
from .params_builder import FillBatchPlan, LanguageModelBatchBuilder
from .profiler import BatchSchedulerProfiler, BatchSchedulerProfilerConfig
from .rcb import BatchRequest, RequestControlBlock
from .request_processor import (RequestProcessParameters, RequestProcessor,
                                RequestProcessorConfig,
                                RequestProcessorObserver)
from .scenario import ScenarioClassifier, ScenarioType
from .scheduler import (BatchScheduler, BatchSchedulerConfig,
                        BatchSchedulerMetrics)
from .worker import VanillaWorker, Worker, WorkerConfig

__all__ = [
    "CallbackFuture", "ComposeFuture", "EmptyFuture", "Future",
    "InstructionExecutor",
    "EmptyInstruction", "EPMigrate", "Fill", "ImageEmbed", "ImageEmbedFill",
    "Instruction", "InstructionList", "InstructionListBuilder",
    "MigrateRequest", "PDMigrate", "PullCache", "TextFill",
    "RequestMetric", "log_latency_breakdown",
    "CallbackOutputTokenProcessor", "LogOutputTokenProcessor",
    "OfflineOutputTokenProcessor", "OutputTokenParams", "OutputTokenProcessor",
    "PrintOutputTokenProcessor", "PrintTextOutputTokenProcessor",
    "ZmqOutputTokenProcessor",
    "FillBatchPlan", "LanguageModelBatchBuilder",
    "BatchSchedulerProfiler", "BatchSchedulerProfilerConfig",
    "BatchRequest", "RequestControlBlock",
    "RequestProcessParameters", "RequestProcessor", "RequestProcessorConfig",
    "RequestProcessorObserver",
    "ScenarioClassifier", "ScenarioType",
    "BatchScheduler", "BatchSchedulerConfig", "BatchSchedulerMetrics",
    "VanillaWorker", "Worker", "WorkerConfig",
]
