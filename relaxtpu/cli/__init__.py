"""Command-line entry points: predict / extract / train / finetune."""
