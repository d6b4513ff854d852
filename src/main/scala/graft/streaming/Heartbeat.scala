package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import graft.sources.MessageSink

/** S8 — service registry / heartbeat, ops-plane (not a dataflow operator).
  *
  * The reference POSTs a registration then PUTs periodic heartbeats from a
  * dedicated thread (main.py:156-183, 233-261, with the §0.2 bug that the
  * thread never actually runs concurrently). Spark-first: a
  * StreamingQueryListener — progress events ARE the engine's liveness
  * signal, so heartbeats ride them instead of a busy loop. */
final class Heartbeat(sink: MessageSink, appName: String,
    instanceId: String = java.util.UUID.randomUUID().toString)
    extends StreamingQueryListener {

  private def payload(state: String): String = {
    val host = java.net.InetAddress.getLocalHost
    s"""{"hostname":"${host.getHostName}","ipaddr":"${host.getHostAddress}","instance_id":"$instanceId","state":"$state"}"""
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    sink.publish(s"services/$appName", payload("started"))

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    sink.publish(s"services/$appName/$instanceId", payload("running"))

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    sink.publish(s"services/$appName/$instanceId", payload("stopped"))
}
