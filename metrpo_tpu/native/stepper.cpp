// Native batched MuJoCo stepper.
//
// TPU-native replacement for the reference's fork-based parallel env
// executors (reference envs/parallel_vec_env_executor.py:78-176 and the
// rllab singleton_pool workers behind samplers/batch_sampler.py:16-41):
// instead of shipping pickled observations between worker processes, a
// persistent std::thread pool steps B independent (mjModel*, mjData*)
// pairs in parallel inside one address space, with zero IPC and the GIL
// released for the whole batch step.  Each env step reproduces
// MujocoHostEnv.forward_dynamics exactly: clip action to [-1,1], scale to
// actuator ctrlrange, frame_skip x mj_step, mj_forward (and mj_subtreeVel
// so COM velocities are current for observation extraction).
//
// Thread safety: each env owns a private mjData (and here a private
// mjModel); MuJoCo documents mj_step as thread-safe under that layout.
//
// Build: compiled on first use by metrpo_tpu/native/__init__.py with g++
// against the headers and libmujoco shipped inside the `mujoco` wheel.

#include <mujoco/mujoco.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// One physics advance for env i, matching MujocoHostEnv.forward_dynamics.
void StepOne(const mjModel* m, mjData* d, const double* action, int nu,
             int frame_skip) {
  const int n = nu < m->nu ? nu : m->nu;
  for (int j = 0; j < n; ++j) {
    double a = action[j];
    a = a < -1.0 ? -1.0 : (a > 1.0 ? 1.0 : a);
    const double lo = m->actuator_ctrlrange[2 * j];
    const double hi = m->actuator_ctrlrange[2 * j + 1];
    d->ctrl[j] = lo + (a + 1.0) * 0.5 * (hi - lo);
  }
  for (int k = 0; k < frame_skip; ++k) {
    mj_step(m, d);
  }
  // mj_step leaves derived quantities at the pre-integration state;
  // recompute for the new (qpos, qvel) — see host_env.forward_dynamics.
  mj_forward(m, d);
  mj_subtreeVel(m, d);
}

class Pool {
 public:
  explicit Pool(int n_threads) {
    if (n_threads < 1) n_threads = 1;
    workers_.reserve(n_threads);
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    work_cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void StepBatch(const uint64_t* models, uint64_t* datas, int batch,
                 const double* actions, int nu, const int* frame_skip,
                 const int* torso_ids = nullptr, int nq = 0, int nv = 0,
                 double* qpos_out = nullptr, double* qvel_out = nullptr,
                 double* com_out = nullptr, double* comvel_out = nullptr) {
    std::unique_lock<std::mutex> lock(mu_);
    models_ = models;
    datas_ = datas;
    actions_ = actions;
    frame_skip_ = frame_skip;
    batch_ = batch;
    nu_ = nu;
    torso_ids_ = torso_ids;
    nq_ = nq;
    nv_ = nv;
    qpos_out_ = qpos_out;
    qvel_out_ = qvel_out;
    com_out_ = com_out;
    comvel_out_ = comvel_out;
    next_.store(0, std::memory_order_relaxed);
    remaining_ = batch;
    ++generation_;
    work_cv_.notify_all();
    done_cv_.wait(lock, [this] { return remaining_ == 0; });
  }

 private:
  void Run() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lock(mu_);
        work_cv_.wait(lock, [&] { return stop_ || generation_ != seen; });
        if (stop_) return;
        seen = generation_;
      }
      int completed = 0;
      for (;;) {
        const int i = next_.fetch_add(1, std::memory_order_relaxed);
        if (i >= batch_) break;
        mjData* d = reinterpret_cast<mjData*>(datas_[i]);
        StepOne(reinterpret_cast<const mjModel*>(models_[i]), d,
                actions_ + i * nu_, nu_, frame_skip_[i]);
        if (qpos_out_ != nullptr) {
          // batched state extraction: qpos/qvel plus the torso subtree COM
          // and COM velocity — everything the locomotion envs' vectorized
          // post_step needs, so no per-env python touches MjData at all.
          for (int j = 0; j < nq_; ++j) qpos_out_[i * nq_ + j] = d->qpos[j];
          for (int j = 0; j < nv_; ++j) qvel_out_[i * nv_ + j] = d->qvel[j];
          const int t = torso_ids_[i];
          for (int j = 0; j < 3; ++j) {
            com_out_[3 * i + j] = d->subtree_com[3 * t + j];
            comvel_out_[3 * i + j] = d->subtree_linvel[3 * t + j];
          }
        }
        ++completed;
      }
      if (completed > 0) {
        std::lock_guard<std::mutex> lock(mu_);
        remaining_ -= completed;
        if (remaining_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable work_cv_, done_cv_;
  // Current job (written under mu_ before notify; read-only while active).
  const uint64_t* models_ = nullptr;
  uint64_t* datas_ = nullptr;
  const double* actions_ = nullptr;
  const int* frame_skip_ = nullptr;
  const int* torso_ids_ = nullptr;
  int batch_ = 0;
  int nu_ = 0;
  int nq_ = 0;
  int nv_ = 0;
  double* qpos_out_ = nullptr;
  double* qvel_out_ = nullptr;
  double* com_out_ = nullptr;
  double* comvel_out_ = nullptr;
  std::atomic<int> next_{0};
  int remaining_ = 0;
  uint64_t generation_ = 0;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* metrpo_pool_create(int n_threads) { return new Pool(n_threads); }

void metrpo_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// models/datas: raw mjModel*/mjData* addresses (from the python bindings'
// _address); actions: row-major (batch, nu) in [-1, 1]; frame_skip: per-env.
void metrpo_step_batch(void* pool, const uint64_t* models, uint64_t* datas,
                       int batch, const double* actions, int nu,
                       const int* frame_skip) {
  static_cast<Pool*>(pool)->StepBatch(models, datas, batch, actions, nu,
                                      frame_skip);
}

// Step + batched state extraction (qpos, qvel, torso subtree com/comvel)
// into caller-provided row-major buffers: (batch, nq), (batch, nv),
// (batch, 3), (batch, 3).
void metrpo_step_batch_extract(void* pool, const uint64_t* models,
                               uint64_t* datas, int batch,
                               const double* actions, int nu,
                               const int* frame_skip, const int* torso_ids,
                               int nq, int nv, double* qpos_out,
                               double* qvel_out, double* com_out,
                               double* comvel_out) {
  static_cast<Pool*>(pool)->StepBatch(models, datas, batch, actions, nu,
                                      frame_skip, torso_ids, nq, nv, qpos_out,
                                      qvel_out, com_out, comvel_out);
}

int metrpo_mujoco_version() { return mj_version(); }

}  // extern "C"
