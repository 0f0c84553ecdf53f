from omnihd_scenes_tpu.serve.export import (export_model, load_exported,
                                            ExportedModel)

__all__ = ['export_model', 'load_exported', 'ExportedModel']
