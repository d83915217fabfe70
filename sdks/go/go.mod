module github.com/cortex-tpu/cortex-go

go 1.21
